"""Production kernel-dispatch branches of ``rdf_cn`` driven on CPU.

The TPU fast paths (`use_rel`, type-block pallas, the CN relation-count
kernel) normally engage only on a real accelerator; the `_FORCE_KERNEL`
hook forces each branch with the Pallas kernels in interpreter mode, so
the dispatch wiring (per-frame ORB sort, relation projection, per-frame
normalization) is pinned against the scatter path bit-for-bit."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdproptools_tpu.structural import rdf_cn

RELS = np.array([[1, 2], [3, 3]])


@pytest.fixture
def system():
    rng = np.random.default_rng(41)
    T, n, box = 3, 700, 14.0
    pos = rng.uniform(0, box, (T, n, 3))
    codes = rng.integers(1, 4, n)
    lengths = np.full((T, 3), box)
    counts = np.bincount(codes - 1, minlength=3).astype(np.float64)
    return pos, codes, lengths, counts


def _run(pos, codes, lengths, counts, **kw):
    return rdf_cn._rdf_mean(
        pos, codes, 3, lengths, 0.1, 128, 6.0, RELS, counts, counts,
        exclude_self=True, with_full=True, dtype=jnp.float32, **kw)


@pytest.mark.parametrize("forced", ["rel", "type-block"])
def test_forced_kernel_matches_scatter(system, forced, monkeypatch):
    # exact_bins=False: the plain-f32 rel kernel is bit-equal to the
    # f32 scatter path (the exact-bins upgrade is pinned separately
    # by test_forced_rel_exact_bins_matches_strict)
    pos, codes, lengths, counts = system
    want_full, want_rels = _run(pos, codes, lengths, counts)
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", forced)
    got_full, got_rels = _run(pos, codes, lengths, counts,
                              spatial_sort=True, exact_bins=False)
    np.testing.assert_array_equal(np.asarray(got_full),
                                  np.asarray(want_full))
    np.testing.assert_array_equal(np.asarray(got_rels),
                                  np.asarray(want_rels))


def test_forced_rel_exact_bins_matches_strict(system, monkeypatch):
    """The flagship exactness contract: fast mode through the exact-bins
    rel path returns BIT-EQUAL g(r) to strict (float64) mode — every
    pair binned as the f64 reference loop, normalization in f64 on
    host."""
    pos, codes, lengths, counts = system
    strict_full, strict_rels = rdf_cn._rdf_mean(
        pos, codes, 3, lengths, 0.1, 128, 6.0, RELS, counts, counts,
        exclude_self=True, with_full=True, dtype=jnp.float64)
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", "rel")
    got_full, got_rels = _run(pos, codes, lengths, counts,
                              spatial_sort=True, exact_bins=True)
    np.testing.assert_array_equal(np.asarray(got_full),
                                  np.asarray(strict_full))
    np.testing.assert_array_equal(np.asarray(got_rels),
                                  np.asarray(strict_rels))
    # the plain f32 path does NOT reach strict bit-equality (vacuity)
    got32_full, _ = _run(pos, codes, lengths, counts,
                         spatial_sort=True, exact_bins=False)
    assert np.any(np.asarray(got32_full) != np.asarray(strict_full))


def test_exact_bins_true_raises_off_path(system):
    """exact_bins=True must refuse paths it cannot make exact (here:
    the scatter policy on the CPU backend)."""
    pos, codes, lengths, counts = system
    with pytest.raises(ValueError, match="exact_bins"):
        _run(pos, codes, lengths, counts, exact_bins=True)


def test_forced_rel_cross_layout_matches_scatter(system, monkeypatch):
    """Cross-layout (atom vs COM-like columns) rel-kernel dispatch."""
    pos, codes, lengths, counts = system
    rng = np.random.default_rng(43)
    m = 300
    pos_cols = rng.uniform(0, 14.0, (3, m, 3))
    codes_cols = rng.integers(1, 3, m)
    counts_cols = np.bincount(codes_cols - 1, minlength=2).astype(
        np.float64)
    kw = dict(pos_cols=pos_cols, codes_cols=codes_cols, n_codes_cols=2)
    rels = np.array([[1, 2], [3, 1]])

    def run(**extra):
        return rdf_cn._rdf_mean(
            pos, codes, 3, lengths, 0.1, 128, 6.0, rels, counts,
            counts_cols, exclude_self=False, with_full=False,
            dtype=jnp.float32, **kw, **extra)

    _, want = run()
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", "rel")
    _, got = run(spatial_sort=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_program_cache_reuses_block_runner(system):
    """A second entry-point call on the same system must reuse the
    cached block program (no re-trace) yet still see the new frame data
    (positions are traced arguments, never baked constants)."""
    pos, codes, lengths, counts = system
    rng = np.random.default_rng(47)
    pos2 = rng.uniform(0, 14.0, pos.shape)

    rdf_cn._STEP_CACHE.clear()  # earlier tests may have warmed it
    rdf_cn._trace_log.clear()
    full_a, _ = _run(pos, codes, lengths, counts)
    n_traces = len(rdf_cn._trace_log)
    assert n_traces >= 1
    full_b, _ = _run(pos2, codes, lengths, counts)
    assert len(rdf_cn._trace_log) == n_traces, "second call re-traced"
    assert not np.array_equal(np.asarray(full_a), np.asarray(full_b)), (
        "cached program returned stale data"
    )
    # same data through the cached program reproduces exactly
    full_c, _ = _run(pos, codes, lengths, counts)
    np.testing.assert_array_equal(np.asarray(full_c), np.asarray(full_a))


def test_rdf_policy_follows_box_volume():
    """The dispatch policy must re-select the kernel as the box density
    changes: a box large relative to r_cut keeps the rel kernel's tile
    cull effective (kept_est < 2.5), a severely compressed box does
    not (the unmeasured small-dense regime falls back to type-block)."""
    n = 50_000
    # large box: low kept_est -> rel kernel
    use_rel, _, kept_big = rdf_cn._rdf_policy(
        n, 90.0**3, 8.0, "auto", use_pallas=True, distinct_rels=True)
    assert use_rel and kept_big < 2.5
    # same system compressed: cull useless -> type-block kernel
    use_rel2, _, kept_small = rdf_cn._rdf_policy(
        n, 13.0**3, 8.0, "auto", use_pallas=True, distinct_rels=True)
    assert not use_rel2 and kept_small > 2.5
    # no pallas (strict/CPU) never engages either fast path
    assert rdf_cn._rdf_policy(n, 90.0**3, 8.0, "auto", False, True)[0] \
        is False


def test_npt_policy_switch_streaming(monkeypatch):
    """An NPT-style stream whose box volume drifts across blocks must
    re-evaluate the kernel policy per block (VERDICT r2 item 5) — and
    the switching run must stay bit-identical to the single-kernel
    scatter reference (integer counts, shared normalizer)."""
    rng = np.random.default_rng(53)
    n = 700
    codes = rng.integers(1, 4, n)
    counts = np.bincount(codes - 1, minlength=3).astype(np.float64)
    pos1 = rng.uniform(0, 14.0, (2, n, 3))
    len1 = np.full((2, 3), 14.0)
    pos2 = rng.uniform(0, 12.0, (2, n, 3))
    len2 = np.full((2, 3), 12.0)

    def blocks():
        yield pos1, None, len1
        yield pos2, None, len2

    def run(**extra):
        return rdf_cn._rdf_mean(
            pos1, codes, 3, len1, 0.1, 128, 6.0, RELS, counts, counts,
            exclude_self=True, with_full=True, dtype=jnp.float32,
            blocks=blocks(), **extra)

    want_full, want_rels = run()  # scatter path, policy (False, False)

    # volume-keyed fake policy: big box -> rel, shrunken box -> type-block
    def fake_policy(n_at, v_min, r_cut, ss, use_pallas, distinct):
        return (bool(use_pallas and v_min > 2000.0), False, v_min)

    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", "auto")
    monkeypatch.setattr(rdf_cn, "_rdf_policy", fake_policy)
    rdf_cn._policy_log.clear()
    # exact_bins=False: this test pins that the POLICY SWITCH itself is
    # exact across the f32 kernels (the rel block would otherwise run
    # the exact-bins upgrade and differ from scatter at ~1e-7)
    got_full, got_rels = run(exact_bins=False)
    assert [p[0] for p in rdf_cn._policy_log] == [True, False], (
        "policy did not follow the shrinking box across blocks")
    np.testing.assert_array_equal(np.asarray(got_full),
                                  np.asarray(want_full))
    np.testing.assert_array_equal(np.asarray(got_rels),
                                  np.asarray(want_rels))


def test_periodic_tiling_preserves_rdf(system):
    """g(r) of a 2x2x1 periodic replication equals the original g(r)
    exactly (each atom's periodic environment is unchanged, counts and
    N scale together) — validates the PBC/minimum-image handling and
    the benchmark methodology that tiles the bundled box to the
    north-star atom count."""
    pos, codes, lengths, counts = system
    L = lengths[0]
    want_full, want_rels = rdf_cn._rdf_mean(
        pos, codes, 3, lengths, 0.1, 40, 4.0, RELS, counts, counts,
        exclude_self=True, with_full=True, dtype=jnp.float64)
    shifts = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]
    pos4 = np.concatenate(
        [pos + (np.array(s) * L)[None, None, :] for s in shifts], axis=1)
    codes4 = np.tile(codes, 4)
    len4 = np.broadcast_to(L * np.array([2.0, 2.0, 1.0]),
                           lengths.shape).copy()
    counts4 = counts * 4
    got_full, got_rels = rdf_cn._rdf_mean(
        pos4, codes4, 3, len4, 0.1, 40, 4.0, RELS, counts4, counts4,
        exclude_self=True, with_full=True, dtype=jnp.float64)
    np.testing.assert_allclose(got_full, want_full, rtol=1e-12, atol=0)
    np.testing.assert_allclose(got_rels, want_rels, rtol=1e-12, atol=0)


def test_forced_cn_kernel_matches_dense(system, monkeypatch):
    pos, codes, lengths, counts = system
    r_cuts = np.array([3.0, 4.5])
    want = rdf_cn._cn_mean(pos, codes, 3, lengths, RELS, r_cuts, counts,
                           exclude_self=True, dtype=jnp.float32)
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", "rel")
    got = rdf_cn._cn_mean(pos, codes, 3, lengths, RELS, r_cuts, counts,
                          exclude_self=True, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
