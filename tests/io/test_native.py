"""Native C++ parser: bit-exactness vs Python float() on real data."""

import os

import numpy as np
import pytest

from mdproptools_tpu.io import _native


@pytest.fixture(scope="module")
def body(mg_tfsi_dme_dir):
    with open(os.path.join(mg_tfsi_dme_dir, "dump.nvt.0.dump")) as f:
        text = f.read()
    b = text[text.index("ITEM: ATOMS"):]
    return b[b.index("\n") + 1:]


def test_native_parser_bit_exact(body):
    arr = _native.parse_floats(body, 20)
    if arr is None:
        pytest.skip("native parser unavailable (no toolchain)")
    rows = [l.split() for l in body.splitlines() if l.strip()]
    want = np.array([[float(v) for v in r] for r in rows])
    assert arr.shape == want.shape
    assert np.array_equal(arr, want)


def test_native_parser_edge_tokens():
    if _native._load() is None:
        pytest.skip("native parser unavailable")
    text = ("1e-3 -2.5E+4 0.0001 -0 123456789012345678901 3.14159\n"
            "+1.5 .5 2. 1e30 -1e-30 42\n")
    arr = _native.parse_floats(text, 6)
    want = np.array([[float(v) for v in line.split()]
                     for line in text.strip().splitlines()])
    assert np.array_equal(arr, want)
