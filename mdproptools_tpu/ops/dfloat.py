"""
Double-f32 ("two-float") arithmetic for exact pair binning on TPU.

TPU has no native float64; fast mode computes in f32, which jitters the
RDF bin index ``trunc(sqrt(rsq)/bin_size)`` across bin edges for a
~1e-4 fraction of pairs (measured max |u32 - u64| = 1.7e-4 u-units on
the bundled frame; BASELINE.md "fast-mode envelope"). Representing each
position as an (hi, lo) pair of f32 (hi = f32(x), lo = f32(x - hi) —
48 significand bits) and carrying the pair math in compensated
arithmetic keeps the relative error of u = sqrt(rsq)/bin_size at
~2^-45, five orders below the edge-ambiguity scale, so every pair bins
exactly as the float64 reference loop does (up to pairs within ~1e-12
of an edge — probability ~1e-11 per pair, unobservable even at
north-star scale).

All functions are elementwise jnp expressions (mul/add/sub/where/
compare/sqrt/floor only), valid inside Pallas TPU kernels (Mosaic) and
under plain jit/interpret. Exactness of the error terms requires IEEE
round-to-nearest f32 without implicit FMA contraction of the written
expressions — XLA does not contract independent mul/add HLOs, and the
kernel-vs-oracle equality is pinned by tests on both backends
(``tests/ops/test_dfloat.py``, ``test_pairs_pallas.py``).

References: Dekker (1971) exact products without FMA; Knuth two-sum;
the standard double-double recipes (Hida/Li/Bailey). Reference
semantics being reproduced: ``/root/reference/mdproptools/structural/
rdf_cn.py:36-69`` (minimum-image wrap, rsq, trunc-binning in float64).
"""

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for f32 (24-bit)


def split_hi_lo(x64):
    """Host-side split of a float64 array into (hi, lo) float32 parts
    with hi + lo == x64 to 2^-49 relative (numpy in, numpy out)."""
    import numpy as np

    hi = np.asarray(x64, np.float64).astype(np.float32)
    lo = (np.asarray(x64, np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return hi, lo


def const_hi_lo(x) -> tuple:
    """(hi, lo) float32 literals of a Python float (trace-time)."""
    import numpy as np

    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return float(hi), float(lo)


def two_sum(a, b):
    """Exact a + b = s + e (Knuth; no magnitude precondition)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def sq_exact(a):
    """Exact a * a = p + e via Dekker splitting (no FMA needed)."""
    p = a * a
    c = jnp.float32(_SPLIT) * a
    hi = c - (c - a)
    lo = a - hi
    e = ((hi * hi - p) + jnp.float32(2.0) * hi * lo) + lo * lo
    return p, e


def prod_exact(a, b):
    """Exact a * b = p + e via Dekker splitting (no FMA needed)."""
    p = a * b
    ca = jnp.float32(_SPLIT) * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = jnp.float32(_SPLIT) * b
    bhi = cb - (cb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def df_add(xh, xl, yh, yl):
    """Two-float + two-float, normalized (error ~2^-47 relative)."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_neg(xh, xl):
    return -xh, -xl


def df_lt(xh, xl, yh, yl):
    """(xh, xl) < (yh, yl) for normalized two-floats."""
    return (xh < yh) | ((xh == yh) & (xl < yl))


def df_gt(xh, xl, yh, yl):
    return (xh > yh) | ((xh == yh) & (xl > yl))


def pair_u_df(dxh, dxl, dyh, dyl, dzh, dzl, inv_h, inv_l):
    """u = sqrt(dx^2 + dy^2 + dz^2) * (1/bin_size) in two-float.

    Inputs are normalized two-float displacement components; inv_* is
    the two-float reciprocal bin width (trace-time constants). Returns
    (uh, ul, rsqh, rsql). Relative error ~2^-44.
    """
    # squares: exact head + first-order cross term (dl^2 ~ 2^-48, kept
    # inside the cheap lo accumulation)
    pxh, pxe = sq_exact(dxh)
    pxl = pxe + (jnp.float32(2.0) * dxh * dxl + dxl * dxl)
    pyh, pye = sq_exact(dyh)
    pyl = pye + (jnp.float32(2.0) * dyh * dyl + dyl * dyl)
    pzh, pze = sq_exact(dzh)
    pzl = pze + (jnp.float32(2.0) * dzh * dzl + dzl * dzl)
    rh, rl = df_add(pxh, pxl, pyh, pyl)
    rh, rl = df_add(rh, rl, pzh, pzl)
    # sqrt: f32 seed + one compensated Newton step (doubles precision);
    # max guards the NaN from compensation leaving rh a hair negative
    # at rsq ~ 0 (self pairs, later masked)
    s0 = jnp.sqrt(jnp.maximum(rh, jnp.float32(0.0)))
    th, te = sq_exact(s0)
    dh, dl = df_add(rh, rl, -th, -te)
    denom = jnp.float32(2.0) * s0
    corr = jnp.where(denom > 0, dh / denom, jnp.float32(0.0))
    sh, sl = fast_two_sum(s0, corr)
    # u = s * inv (two-float x two-float, first order)
    uh0, ue = prod_exact(sh, inv_h)
    ul = ue + (sh * inv_l + sl * inv_h)
    uh, ul = fast_two_sum(uh0, ul)
    return uh, ul, rh, rl


def df_floor(uh, ul):
    """floor(uh + ul) for normalized two-floats with 0 <= uh < 2^23.

    The boundary decisions are made on the EXACT sum frac + ul via
    two_sum (a plain f32 ``frac + ul >= 1`` comparison would re-round
    at 2^-25 of the edge — the very ambiguity this module removes)."""
    bf = jnp.floor(uh)
    frac = uh - bf  # exact (Sterbenz: uh and bf share [bf, bf+1))
    s, e = two_sum(frac, ul)  # s + e == frac + ul exactly
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    # frac + ul >= 1  <=>  s > 1, or s == 1 and e >= 0; round-to-nearest
    # guarantees s >= 1 whenever the true sum is >= 1
    bump_up = ((s >= one) & ~((s == one) & (e < zero))).astype(jnp.int32)
    # frac + ul < 0  <=>  s < 0, or s == 0 and e < 0
    bump_dn = ((s < zero) | ((s == zero) & (e < zero))).astype(jnp.int32)
    return bf.astype(jnp.int32) + bump_up - bump_dn


def wrap_df(dh, dl, lh, ll):
    """Minimum-image single-wrap of a two-float displacement: the
    reference's branch semantics (``rdf_cn.py:50-55``) decided on the
    two-float value: d > L/2 -> d - L; d < -L/2 -> d + L. L/2 is exact
    (scaling by 0.5)."""
    hh = lh * jnp.float32(0.5)
    hl = ll * jnp.float32(0.5)
    gt = df_gt(dh, dl, hh, hl)
    lt = df_lt(dh, dl, -hh, -hl)
    mh, ml = df_add(dh, dl, -lh, -ll)
    ph, pl = df_add(dh, dl, lh, ll)
    oh = jnp.where(gt, mh, jnp.where(lt, ph, dh))
    ol = jnp.where(gt, ml, jnp.where(lt, pl, dl))
    return oh, ol


def pair_bins_df(
    xr_h, xr_l, yr_h, yr_l, zr_h, zr_l,  # rows, broadcastable
    xc_h, xc_l, yc_h, yc_l, zc_h, zc_l,  # cols, broadcastable
    lx_h, lx_l, ly_h, ly_l, lz_h, lz_l,  # box lengths (two-float)
    inv_h, inv_l,  # 1 / bin_size (two-float trace-time constants)
    rc2_h, rc2_l,  # r_cut^2 (two-float trace-time constants)
):
    """Exact bin index and cutoff test for a broadcast pair tile.

    Returns (b int32, within_cutoff bool): b = floor(sqrt(rsq) /
    bin_size) and rsq < r_cut^2 evaluated in two-float arithmetic —
    equal to the float64 reference evaluation for every pair not within
    ~2^-44 relative of an edge."""
    def axis(rh_, rl_, ch_, cl_, Lh_, Ll_):
        d, e = two_sum(rh_, -ch_)
        dl = e + (rl_ - cl_)
        # two_sum, not fast_two_sum: d can be smaller than dl when the
        # hi parts cancel (near-identical coordinates)
        dh2, dl2 = two_sum(d, dl)
        return wrap_df(dh2, dl2, Lh_, Ll_)

    dxh, dxl = axis(xr_h, xr_l, xc_h, xc_l, lx_h, lx_l)
    dyh, dyl = axis(yr_h, yr_l, yc_h, yc_l, ly_h, ly_l)
    dzh, dzl = axis(zr_h, zr_l, zc_h, zc_l, lz_h, lz_l)
    uh, ul, rh, rl = pair_u_df(dxh, dxl, dyh, dyl, dzh, dzl, inv_h, inv_l)
    b = df_floor(uh, ul)
    within = df_lt(rh, rl, rc2_h, rc2_l)
    return b, within
