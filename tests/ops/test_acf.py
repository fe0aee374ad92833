"""FFT correlators vs brute-force oracles (the reference embeds the same
cross-check: viscosity.py:103-115)."""

import jax.numpy as jnp
import numpy as np
from scipy.integrate import cumulative_trapezoid

from mdproptools_tpu.ops import acf


def test_correlate_matches_brute():
    rng = np.random.default_rng(0)
    a = rng.normal(size=257)
    b = rng.normal(size=257)
    got = np.asarray(acf.correlate(jnp.asarray(a), jnp.asarray(b)))
    want = acf.correlate_brute(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_autocorrelate_matches_brute():
    rng = np.random.default_rng(1)
    x = rng.normal(size=300)
    got = np.asarray(acf.autocorrelate(jnp.asarray(x)))
    want = acf.autocorrelate_brute(x)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_autocorrelate_unbiased_nondemeaned_semantics():
    """acovf(demean=False, unbiased=True): lag-k value =
    sum_t x_t x_{t+k} / (n-k)."""
    x = np.array([1.0, 2.0, 3.0, 4.0])
    got = np.asarray(acf.autocorrelate(jnp.asarray(x)))
    want = np.array([
        (1 + 4 + 9 + 16) / 4,
        (1 * 2 + 2 * 3 + 3 * 4) / 3,
        (1 * 3 + 2 * 4) / 2,
        (1 * 4) / 1,
    ])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_batched_correlate():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 4, 64))
    b = rng.normal(size=(3, 4, 64))
    got = np.asarray(acf.correlate(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(
                got[i, j], acf.correlate_brute(a[i, j], b[i, j]),
                rtol=1e-9, atol=1e-12,
            )


def test_cumtrapz_matches_scipy():
    rng = np.random.default_rng(3)
    y = rng.normal(size=100)
    got = np.asarray(acf.cumtrapz(jnp.asarray(y), 0.37))
    want = cumulative_trapezoid(y, dx=0.37)
    np.testing.assert_allclose(got, want, rtol=1e-12)
