"""Columnar trajectory cache: built once, every later pass must be
bit-identical to the text parser (data, timesteps, bounds), including
column subsets, re-chunked blocks and max_frames; stale caches must be
ignored via the fingerprint."""

import glob
import os
import shutil

import numpy as np
import pytest

from mdproptools_tpu.io.cache import (
    build_cache,
    default_cache_dir,
    load_meta,
)
from mdproptools_tpu.io.lammps_dump import (
    iter_trajectory_blocks,
    read_trajectory,
)


@pytest.fixture()
def data_copy(dump_pattern, tmp_path):
    """Private copy of the bundled dumps (cache dirs are written next
    to the data; don't pollute the repo's data/)."""
    for f in glob.glob(dump_pattern):
        shutil.copy(f, tmp_path / os.path.basename(f))
    return str(tmp_path / "dump.nvt.*.dump")


def _collect(pattern, **kw):
    datas, ts, bounds = [], [], []
    for blk in iter_trajectory_blocks(pattern, **kw):
        datas.append(np.array(blk.data))
        ts.append(blk.timesteps.copy())
        bounds.append(blk.box_bounds.copy())
    return (np.concatenate(datas), np.concatenate(ts),
            np.concatenate(bounds))


def test_cache_roundtrip_bit_identical(data_copy):
    cols = ["id", "type", "x", "y", "z"]
    want = _collect(data_copy, columns=cols, cache=False)
    cache_dir = build_cache(data_copy, columns=cols, block_frames=3)
    assert load_meta(data_copy) is not None
    got = _collect(data_copy, columns=cols, cache="auto")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # column subset reads only those files; still bit-identical
    want_xy = _collect(data_copy, columns=["x", "y"], cache=False)
    got_xy = _collect(data_copy, columns=["x", "y"], cache=cache_dir)
    for g, w in zip(got_xy, want_xy):
        np.testing.assert_array_equal(g, w)


def test_cache_rechunk_and_max_frames(data_copy):
    cols = ["id", "x"]
    build_cache(data_copy, columns=cols, block_frames=2)
    for bf in (1, 3, 100):
        want = _collect(data_copy, columns=cols, cache=False,
                        block_frames=bf)
        got = _collect(data_copy, columns=cols, cache="auto",
                       block_frames=bf)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
    want = _collect(data_copy, columns=cols, cache=False, max_frames=4,
                    block_frames=3)
    got = _collect(data_copy, columns=cols, cache="auto", max_frames=4,
                   block_frames=3)
    assert got[0].shape[0] == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_cache_fingerprint_invalidation(data_copy):
    build_cache(data_copy, columns=["id", "x"], block_frames=3)
    assert load_meta(data_copy) is not None
    # grow one file -> fingerprint mismatch -> cache ignored
    victim = sorted(glob.glob(data_copy))[0]
    with open(victim, "a") as fh:
        fh.write("\n")
    assert load_meta(data_copy) is None
    # iter falls back to text parsing (and still parses fine)
    blk = next(iter_trajectory_blocks(data_copy, columns=["id", "x"]))
    assert blk.n_frames > 0


def test_cache_missing_column_behavior(data_copy):
    cache_dir = build_cache(data_copy, columns=["x", "y"], block_frames=3)
    # auto mode: silently falls back to parsing for uncovered columns
    want = _collect(data_copy, columns=["id", "x"], cache=False)
    got = _collect(data_copy, columns=["id", "x"], cache="auto")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # forced cache dir: explicit error
    with pytest.raises(ValueError, match="lacks requested columns"):
        list(iter_trajectory_blocks(data_copy, columns=["id", "x"],
                                    cache=cache_dir))


def test_entry_point_equal_with_cache(data_copy, tmp_path):
    """calc_atomic_rdf through the cache must equal the text-parse run
    exactly (same block shapes, same summation order)."""
    from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf

    MASS = [16.0, 12.01, 1.008, 14.01, 32.06, 16.0, 12.01, 19.0, 24.305]
    kw = dict(save_mode=False, precision="strict")
    want = calc_atomic_rdf(10, 0.1, 9, MASS, [[8], [9]], data_copy, **kw)
    build_cache(data_copy, columns=["id", "type", "x", "y", "z"])
    assert load_meta(data_copy) is not None
    got = calc_atomic_rdf(10, 0.1, 9, MASS, [[8], [9]], data_copy, **kw)
    np.testing.assert_array_equal(got.to_numpy(), want.to_numpy())


def test_read_trajectory_unaffected(data_copy):
    """read_trajectory doesn't take the cache path (whole-file reads
    stay text-parsed); sanity that both agree anyway."""
    build_cache(data_copy, columns=["id", "x"])
    tr = read_trajectory(data_copy, columns=["id", "x"])
    blk, ts, _ = _collect(data_copy, columns=["id", "x"], cache="auto",
                          block_frames=1000)
    np.testing.assert_array_equal(tr.data, blk)
    np.testing.assert_array_equal(tr.timesteps, ts)


def test_default_cache_dir_location(data_copy):
    d = default_cache_dir(data_copy)
    assert ".mdpt_cache" in d
    assert d.startswith(os.path.dirname(sorted(glob.glob(data_copy))[0]))


def test_decimal_quantization_engages_and_halves_bytes(data_copy):
    """The bundled dump columns sit on fixed decimal grids, so the v2
    cache stores them int32 (half the f64 bytes) and the meta records
    the per-block exponents; the roundtrip tests above already pin
    bit-exactness."""
    cache_dir = build_cache(data_copy,
                            columns=["id", "type", "x", "q", "vx"])
    meta = load_meta(data_copy)
    assert meta is not None and meta["version"] == 4
    enc = meta["encodings"]
    # integer-valued columns quantize at p=0; fixed-decimal columns at
    # their printed precision; %g-printed columns (velocities) store
    # int32 mantissa + per-value int8 exponent
    assert all(p == 0 for p in enc["id"])
    assert all(p == 0 for p in enc["type"])
    assert all(p is not None and p > 0 for p in enc["x"])
    assert all(p is not None for p in enc["q"])
    assert all(isinstance(p, str) and p.startswith("m")
               for p in enc["vx"])
    for name in ("id", "x", "q"):
        arr = np.load(os.path.join(cache_dir, f"c_{name}.0.npy"))
        assert arr.dtype == np.int32
    arr = np.load(os.path.join(cache_dir, "c_vx.0.npy"))
    assert arr.dtype == np.int32
    exps = np.load(os.path.join(cache_dir, "c_vx.0.e.npy"))
    assert exps.dtype == np.int8


def test_quantization_falls_back_for_irrational_columns(tmp_path):
    """A column that is NOT on a decimal grid (synthetic irrational
    velocities) must store in the fallback float dtype and still round-
    trip bit-exactly."""
    from mdproptools_tpu.io.cache import _try_quantize

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 100)) * np.pi
    q, p = _try_quantize(a)
    assert q is None and p is None
    # huge magnitudes exceed int32 even on a grid
    b = np.round(rng.normal(size=(4, 100)) * 1e12)
    q, p = _try_quantize(b)
    assert q is None
    # and a genuine grid quantizes with the hint fast path
    c = np.round(rng.normal(size=(4, 100)) * 1e5) / 1e5
    q, p = _try_quantize(c, p_hint=5)
    assert p == 5 and np.array_equal(q / 10.0**5, c)
