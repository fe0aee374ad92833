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
    pos, codes, lengths, counts = system
    want_full, want_rels = _run(pos, codes, lengths, counts)
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", forced)
    got_full, got_rels = _run(pos, codes, lengths, counts,
                              spatial_sort=True)
    np.testing.assert_array_equal(np.asarray(got_full),
                                  np.asarray(want_full))
    np.testing.assert_array_equal(np.asarray(got_rels),
                                  np.asarray(want_rels))


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


def test_forced_cn_kernel_matches_dense(system, monkeypatch):
    pos, codes, lengths, counts = system
    r_cuts = np.array([3.0, 4.5])
    want = rdf_cn._cn_mean(pos, codes, 3, lengths, RELS, r_cuts, counts,
                           exclude_self=True, dtype=jnp.float32)
    monkeypatch.setattr(rdf_cn, "_FORCE_KERNEL", "rel")
    got = rdf_cn._cn_mean(pos, codes, 3, lengths, RELS, r_cuts, counts,
                          exclude_self=True, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
