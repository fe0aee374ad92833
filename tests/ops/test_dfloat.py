"""Double-f32 exact binning vs the float64 reference evaluation.

The oracle here IS the reference loop semantics: float64 single-wrap
minimum image, rsq, trunc(sqrt(rsq)/bin_size) (reference
rdf_cn.py:36-69). pair_bins_df must reproduce the f64 bin for every
pair, including adversarial positions planted within 1e-9..1e-5 of bin
edges — the exact regime where plain f32 flips bins."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdproptools_tpu.ops import dfloat


def _oracle_bins(pr, pc, L, bin_size, r_cut):
    d = pr[:, None, :] - pc[None, :, :]
    for a in range(3):
        da = d[:, :, a]
        da[da > L[a] / 2] -= L[a]
        da[da < -L[a] / 2] += L[a]
    rsq = (d * d).sum(-1)
    b = np.floor(np.sqrt(rsq) / bin_size).astype(np.int64)
    return b, rsq < r_cut * r_cut


def _df_bins(pr, pc, L, bin_size, r_cut):
    xh, xl = dfloat.split_hi_lo(pr[:, 0])
    yh, yl = dfloat.split_hi_lo(pr[:, 1])
    zh, zl = dfloat.split_hi_lo(pr[:, 2])
    cxh, cxl = dfloat.split_hi_lo(pc[:, 0])
    cyh, cyl = dfloat.split_hi_lo(pc[:, 1])
    czh, czl = dfloat.split_hi_lo(pc[:, 2])
    Lh, Ll = dfloat.split_hi_lo(L)
    inv_h, inv_l = dfloat.const_hi_lo(1.0 / np.float64(bin_size))
    rc2_h, rc2_l = dfloat.const_hi_lo(np.float64(r_cut) * np.float64(r_cut))
    col = lambda a: jnp.asarray(a)[None, :]  # noqa: E731
    row = lambda a: jnp.asarray(a)[:, None]  # noqa: E731
    b, ok = dfloat.pair_bins_df(
        row(xh), row(xl), row(yh), row(yl), row(zh), row(zl),
        col(cxh), col(cxl), col(cyh), col(cyl), col(czh), col(czl),
        jnp.float32(Lh[0]), jnp.float32(Ll[0]),
        jnp.float32(Lh[1]), jnp.float32(Ll[1]),
        jnp.float32(Lh[2]), jnp.float32(Ll[2]),
        jnp.float32(inv_h), jnp.float32(inv_l),
        jnp.float32(rc2_h), jnp.float32(rc2_l),
    )
    return np.asarray(b, np.int64), np.asarray(ok)


def test_random_pairs_bit_equal_to_f64():
    rng = np.random.default_rng(11)
    L = np.array([49.18, 49.18, 49.18])
    bin_size, r_cut = 0.05, 20.0
    pr = rng.uniform(0, L, (256, 3))
    pc = rng.uniform(0, L, (512, 3))
    b64, ok64 = _oracle_bins(pr, pc, L, bin_size, r_cut)
    bdf, okdf = _df_bins(pr, pc, L, bin_size, r_cut)
    np.testing.assert_array_equal(ok64, okdf)
    sel = ok64
    np.testing.assert_array_equal(b64[sel], bdf[sel])


def test_engineered_edge_pairs_bit_equal():
    """Pairs planted at distances r = m*bin_size + delta for delta in
    +-{1e-9..1e-5}: f32 binning flips a large fraction of these; the
    double-f32 path must match f64 on every one."""
    rng = np.random.default_rng(5)
    L = np.array([49.18, 49.18, 49.18])
    bin_size, r_cut = 0.05, 20.0
    deltas = np.array([1e-9, -1e-9, 1e-7, -1e-7, 1e-5, -1e-5])
    ms = np.arange(1, 400, 7)
    rows, cols = [], []
    for m in ms:
        for d in deltas:
            r = m * bin_size + d
            o = rng.uniform(5, 40, 3)
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            rows.append(o)
            cols.append(o + u * r)
    pr = np.array(rows)
    pc = np.array(cols)
    # elementwise pairs: compare the diagonal
    b64, ok64 = _oracle_bins(pr, pc, L, bin_size, r_cut)
    bdf, okdf = _df_bins(pr, pc, L, bin_size, r_cut)
    d64 = np.diagonal(b64)
    ddf = np.diagonal(bdf)
    sel = np.diagonal(ok64)
    np.testing.assert_array_equal(np.diagonal(okdf), np.diagonal(ok64))
    np.testing.assert_array_equal(d64[sel], ddf[sel])
    # sanity: plain f32 DOES flip some of these (else the test is vacuous)
    pr32, pc32 = pr.astype(np.float32), pc.astype(np.float32)
    d32 = pr32[:, None, :] - pc32[None, :, :]
    L32 = L.astype(np.float32)
    for a in range(3):
        da = d32[:, :, a]
        half = np.float32(L32[a] * np.float32(0.5))
        da[da > half] -= L32[a]
        da[da < -half] += L32[a]
    rsq32 = (d32 * d32).sum(-1, dtype=np.float32)
    b32 = (np.sqrt(rsq32) * np.float32(1.0 / bin_size)).astype(np.int64)
    assert (np.diagonal(b32)[sel] != d64[sel]).sum() > 50


def test_cutoff_edge_pairs():
    """Pairs planted within 1e-9 of r_cut: the two-float rsq < r_cut^2
    test must agree with f64 exactly. (delta = 0 is NOT tested: the
    constructed distance then lands within 1 f64 ulp of r_cut, inside
    the documented ~1e-12 band where double-f32 cannot follow f64's
    own last-ulp rounding.)"""
    rng = np.random.default_rng(3)
    L = np.array([49.18, 49.18, 49.18])
    bin_size, r_cut = 0.05, 20.0
    rows, cols = [], []
    for d in [1e-9, -1e-9, 1e-7, -1e-7]:
        for _ in range(40):
            o = rng.uniform(5, 25, 3)
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            rows.append(o)
            cols.append(o + u * (r_cut + d))
    pr, pc = np.array(rows), np.array(cols)
    b64, ok64 = _oracle_bins(pr, pc, L, bin_size, r_cut)
    bdf, okdf = _df_bins(pr, pc, L, bin_size, r_cut)
    np.testing.assert_array_equal(np.diagonal(ok64), np.diagonal(okdf))
    sel = np.diagonal(ok64)
    np.testing.assert_array_equal(np.diagonal(b64)[sel],
                                  np.diagonal(bdf)[sel])


def test_wrap_boundary_pairs():
    """Pairs whose raw displacement sits within 1e-9 of +-L/2: the wrap
    decision must match the f64 branch."""
    L = np.array([40.0, 40.0, 40.0])
    bin_size, r_cut = 0.05, 25.0
    eps = np.array([1e-9, -1e-9, 1e-7, -1e-7])
    rows, cols = [], []
    for e in eps:
        for y in (3.0, 7.5):
            rows.append([1.0, y, 9.0])
            cols.append([1.0 + L[0] / 2 + e, y + 0.3, 9.0 - 0.2])
    pr, pc = np.array(rows), np.array(cols)
    b64, ok64 = _oracle_bins(pr, pc, L, bin_size, r_cut)
    bdf, okdf = _df_bins(pr, pc, L, bin_size, r_cut)
    np.testing.assert_array_equal(np.diagonal(ok64), np.diagonal(okdf))
    sel = np.diagonal(ok64)
    np.testing.assert_array_equal(np.diagonal(b64)[sel],
                                  np.diagonal(bdf)[sel])


def test_two_sum_and_prod_exact():
    rng = np.random.default_rng(0)
    a = rng.normal(size=1000).astype(np.float32) * 100
    b = rng.normal(size=1000).astype(np.float32) * 1e-4
    s, e = dfloat.two_sum(jnp.asarray(a), jnp.asarray(b))
    s, e = np.asarray(s), np.asarray(e)
    np.testing.assert_array_equal(
        s.astype(np.float64) + e.astype(np.float64),
        a.astype(np.float64) + b.astype(np.float64))
    p, pe = dfloat.sq_exact(jnp.asarray(a))
    p, pe = np.asarray(p), np.asarray(pe)
    np.testing.assert_array_equal(
        p.astype(np.float64) + pe.astype(np.float64),
        a.astype(np.float64) * a.astype(np.float64))
