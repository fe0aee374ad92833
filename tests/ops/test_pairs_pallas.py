"""Pallas kernel parity vs the scatter path (interpreter mode on CPU;
the same kernel was verified bit-exact on real TPU hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdproptools_tpu.ops import pairs as pair_ops
from mdproptools_tpu.ops.pairs_pallas import pair_hist_rows_pallas


@pytest.mark.parametrize("exclude_self,compact_cols", [
    (True, False), (False, False), (True, True), (False, True),
])
def test_pallas_matches_scatter(exclude_self, compact_cols):
    rng = np.random.default_rng(5)
    n, box = 300, 11.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    L = jnp.asarray([box] * 3, jnp.float32)
    nc = lay.n_padded // pair_ops.LANE
    got = np.asarray(pair_hist_rows_pallas(
        pp.reshape(nc, pair_ops.LANE, 3),
        jnp.asarray(lay.perm).reshape(nc, pair_ops.LANE).astype(jnp.int32),
        jnp.asarray(lay.chunk_codes, jnp.int32),
        pp, lay, 3, L, 0.05, 400, 5.0, exclude_self, interpret=True,
        compact_cols=compact_cols,
    ))
    want = np.asarray(pair_ops.pair_hist(
        pp, pp, lay, lay, L, 0.05, 400, 5.0, exclude_self,
        dtype=jnp.float32, method="scatter",
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("exclude_self", [True, False])
def test_pallas_triangle_matches_scatter(exclude_self):
    """Triangle mode (upper tiles computed once + mirrored) must be
    count-exact vs the dense scatter path."""
    rng = np.random.default_rng(11)
    n, box = 700, 14.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    L = jnp.asarray([box] * 3, jnp.float32)
    nc = lay.n_padded // pair_ops.LANE
    got = np.asarray(pair_hist_rows_pallas(
        pp.reshape(nc, pair_ops.LANE, 3),
        jnp.asarray(lay.perm).reshape(nc, pair_ops.LANE).astype(jnp.int32),
        jnp.asarray(lay.chunk_codes, jnp.int32),
        pp, lay, 3, L, 0.1, 128, 6.0, exclude_self, interpret=True,
        triangle=True,
    ))
    want = np.asarray(pair_ops.pair_hist(
        pp, pp, lay, lay, L, 0.1, 128, 6.0, exclude_self,
        dtype=jnp.float32, method="scatter",
    ))
    np.testing.assert_array_equal(got, want)


def test_pallas_triangle_device_sort_matches_scatter():
    """Triangle + on-device Morton sort (the default TPU fast path
    composition) must be count-exact vs the dense unsorted scatter path."""
    rng = np.random.default_rng(13)
    n, box = 520, 30.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    L = jnp.asarray([box] * 3, jnp.float32)
    perm = pair_ops.device_sort_perm(
        jnp.asarray(pos), lay, L, pair_ops.pick_ncell(n))
    perm_np = np.asarray(perm)
    for t in range(3):
        s, c = lay.block_start[t], lay.counts[t]
        assert sorted(perm_np[s:s+c]) == sorted(lay.perm[s:s+c])
    pp = pair_ops.gather_padded_perm(jnp.asarray(pos), perm)
    nc = lay.n_padded // pair_ops.LANE
    got = np.asarray(pair_hist_rows_pallas(
        pp.reshape(nc, pair_ops.LANE, 3),
        perm.reshape(nc, pair_ops.LANE).astype(jnp.int32),
        jnp.asarray(lay.chunk_codes, jnp.int32),
        pp, lay, 3, L, 0.05, 200, 8.0, True, interpret=True,
        idx_c=perm, triangle=True,
    ))
    pp0 = pair_ops.gather_padded(jnp.asarray(pos), lay)
    want = np.asarray(pair_ops.pair_hist(
        pp0, pp0, lay, lay, L, 0.05, 200, 8.0, True,
        dtype=jnp.float32, method="scatter",
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("compact_cols", [False, True])
def test_pallas_spatial_sort_matches_scatter(compact_cols):
    """Spatially-sorted per-frame permutation + culling must not change
    results (cull is conservative); in-kernel column compaction
    (``compact_cols``) is exact on or off."""
    rng = np.random.default_rng(9)
    n, box = 520, 30.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    perm = pair_ops.spatial_sort_perm(pos, lay, np.full(3, box))
    # same multiset of atoms per block
    for t in range(3):
        s, c = lay.block_start[t], lay.counts[t]
        assert sorted(perm[s:s+c]) == sorted(lay.perm[s:s+c])
    pp = pair_ops.gather_padded_perm(jnp.asarray(pos), jnp.asarray(perm))
    L = jnp.asarray([box] * 3, jnp.float32)
    nc = lay.n_padded // pair_ops.LANE
    got = np.asarray(pair_hist_rows_pallas(
        pp.reshape(nc, pair_ops.LANE, 3),
        jnp.asarray(perm).reshape(nc, pair_ops.LANE).astype(jnp.int32),
        jnp.asarray(lay.chunk_codes, jnp.int32),
        pp, lay, 3, L, 0.05, 200, 8.0, True, interpret=True,
        idx_c=jnp.asarray(perm), compact_cols=compact_cols,
    ))
    # reference: unsorted layout, scatter path
    pp0 = pair_ops.gather_padded(jnp.asarray(pos), lay)
    want = np.asarray(pair_ops.pair_hist(
        pp0, pp0, lay, lay, L, 0.05, 200, 8.0, True,
        dtype=jnp.float32, method="scatter",
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lane_split", [True, False])
@pytest.mark.parametrize("exclude_self,triangle,with_full", [
    (True, False, True), (True, True, True), (True, True, False),
    (False, False, True), (False, True, True), (False, True, False),
])
def test_relation_kernel_matches_scatter(exclude_self, triangle, with_full,
                                         lane_split, monkeypatch):
    """Relation-projected mixed-tile kernel (global Morton order, fused
    multi-hot dot) must equal project_relations of the dense scatter
    histogram, in every mode combination, with and without the G=2
    lane-split column pairing."""
    from mdproptools_tpu.ops import pairs_pallas
    from mdproptools_tpu.ops.pairs_pallas import pair_hist_relations_pallas

    monkeypatch.setattr(pairs_pallas, "REL_LANE_SPLIT", lane_split)

    rng = np.random.default_rng(7)
    n, box = 700, 14.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    L = jnp.full(3, box, jnp.float32)
    relations = np.array([[1, 2], [2, 1], [3, 3], [1, 1]])
    counts = np.bincount(codes - 1, minlength=3)

    n_pad = -(-n // 128) * 128
    pm = pair_ops.device_sort_global(
        jnp.asarray(pos), n, n_pad, L, pair_ops.pick_ncell(n))
    pr = pair_ops.gather_padded_perm(jnp.asarray(pos), pm)
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    ty = jnp.where(pm >= 0, codes0[jnp.maximum(pm, 0)], -1.0)

    hist = pair_ops.pair_hist(pp, pp, lay, lay, L, 0.1, 128, 6.0,
                              exclude_self, dtype=jnp.float32,
                              method="scatter")
    wfull, wrels = pair_ops.project_relations(hist, relations, with_full)
    gfull, grels = pair_hist_relations_pallas(
        pr, pm, ty, pr, pm, ty, relations - 1, L, 0.1, 128, 6.0,
        exclude_self, with_full, triangle=triangle, interpret=True,
        counts_r=counts)
    np.testing.assert_array_equal(np.asarray(grels), np.asarray(wrels))
    if with_full:
        np.testing.assert_array_equal(np.asarray(gfull), np.asarray(wfull))


def test_relation_kernel_cross_layout():
    """Cross-layout (atoms vs molecular COMs) relation kernel parity."""
    from mdproptools_tpu.ops.pairs_pallas import pair_hist_relations_pallas

    rng = np.random.default_rng(17)
    n, m, box = 500, 200, 12.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    com = rng.uniform(0, box, (m, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    mcodes = rng.integers(1, 3, m)
    lay_r = pair_ops.build_type_layout(codes, 3)
    lay_c = pair_ops.build_type_layout(mcodes, 2)
    L = jnp.full(3, box, jnp.float32)
    relations = np.array([[1, 2], [3, 1]])

    pp_r = pair_ops.gather_padded(jnp.asarray(pos), lay_r)
    pp_c = pair_ops.gather_padded(jnp.asarray(com), lay_c)
    hist = pair_ops.pair_hist(pp_r, pp_c, lay_r, lay_c, L, 0.1, 128, 6.0,
                              False, dtype=jnp.float32, method="scatter")
    _, wrels = pair_ops.project_relations(hist, relations, False)

    def side(p, nn, ncodes_arr):
        n_pad = -(-nn // 128) * 128
        pm = pair_ops.device_sort_global(
            jnp.asarray(p), nn, n_pad, L, pair_ops.pick_ncell(nn))
        pr = pair_ops.gather_padded_perm(jnp.asarray(p), pm)
        c0 = jnp.asarray(ncodes_arr - 1, jnp.float32)
        ty = jnp.where(pm >= 0, c0[jnp.maximum(pm, 0)], -1.0)
        return pr, pm, ty

    pr, pm, ty = side(pos, n, codes)
    pc, pmc, tyc = side(com, m, mcodes)
    _, grels = pair_hist_relations_pallas(
        pr, pm, ty, pc, pmc, tyc, relations - 1, L, 0.1, 128, 6.0,
        False, False, triangle=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(grels), np.asarray(wrels))


def test_sharded_triangle_two_shards_sum_to_dense():
    """Row-sharded triangle (cyclic-half rule with explicit global
    row_tiles): per-shard results summed must equal the dense scatter
    histogram exactly, for odd and even tile counts."""
    rng = np.random.default_rng(23)
    for n, box in ((700, 14.0), (520, 13.0)):  # 6 and 5 padded tiles
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        codes = rng.integers(1, 4, n)
        lay = pair_ops.build_type_layout(codes, 3)
        pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
        L = jnp.asarray([box] * 3, jnp.float32)
        nc = lay.n_padded // pair_ops.LANE
        pr = pp.reshape(nc, pair_ops.LANE, 3)
        idx = jnp.asarray(lay.perm).reshape(nc, pair_ops.LANE)
        ccodes = jnp.asarray(lay.chunk_codes, jnp.int32)
        k = nc // 2
        total = 0
        for sl in (slice(0, k), slice(k, nc)):
            rt = jnp.arange(nc, dtype=jnp.int32)[sl]
            total = total + np.asarray(pair_hist_rows_pallas(
                pr[sl], idx[sl].astype(jnp.int32), ccodes[sl],
                pp, lay, 3, L, 0.1, 128, 6.0, True, interpret=True,
                triangle=True, row_tiles=rt,
            ))
        want = np.asarray(pair_ops.pair_hist(
            pp, pp, lay, lay, L, 0.1, 128, 6.0, True,
            dtype=jnp.float32, method="scatter",
        ))
        np.testing.assert_array_equal(total, want)


def test_row_block_split_matches_single(monkeypatch):
    """ROW_BLOCK splitting (the SMEM-budget guard: big row sets issue
    several pallas_calls whose outputs sum) must not change any
    kernel's counts — forced here with ROW_BLOCK=2 on a 6-tile system."""
    import mdproptools_tpu.ops.pairs_pallas as pp_mod
    from mdproptools_tpu.ops.pairs_pallas import (
        pair_count_relations_pallas,
        pair_hist_relations_pallas,
    )

    rng = np.random.default_rng(43)
    n, box = 700, 14.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    L = jnp.full(3, box, jnp.float32)
    n_pad = -(-n // 128) * 128
    pm = pair_ops.device_sort_orb(jnp.asarray(pos), n, n_pad, L)
    pr = pair_ops.gather_padded_perm(jnp.asarray(pos), pm)
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    ty = jnp.where(pm >= 0, codes0[jnp.maximum(pm, 0)], -1.0)
    relations = np.array([[1, 2], [3, 3]])
    r_cuts = np.array([3.0, 4.5])
    ppd = pair_ops.gather_padded(jnp.asarray(pos), lay)
    nc = lay.n_padded // 128

    def run_all():
        f, r = pair_hist_relations_pallas(
            pr, pm, ty, pr, pm, ty, relations - 1, L, 0.1, 128, 6.0,
            True, True, triangle=True, interpret=True)
        cn = pair_count_relations_pallas(
            pr, pm, ty, pr, pm, ty, relations - 1, r_cuts, L, True,
            triangle=True, interpret=True)
        hist = pair_hist_rows_pallas(
            ppd.reshape(nc, 128, 3),
            jnp.asarray(lay.perm).reshape(nc, 128).astype(jnp.int32),
            jnp.asarray(lay.chunk_codes, jnp.int32),
            ppd, lay, 3, L, 0.1, 128, 6.0, True, interpret=True,
            triangle=True)
        return (np.asarray(f), np.asarray(r), np.asarray(cn),
                np.asarray(hist))

    want = run_all()
    monkeypatch.setattr(pp_mod, "ROW_BLOCK", 2)
    got = run_all()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # column-group splitting too (KC_REL shrunk so the 6-tile system
    # spans several groups; every (row, column) block combination runs
    # with a non-zero prefetched group offset)
    monkeypatch.setattr(pp_mod, "KC_REL", 2)
    monkeypatch.setattr(pp_mod, "COL_GROUP_BLOCK", 1)

    def run_rel_cn():
        f, r = pair_hist_relations_pallas(
            pr, pm, ty, pr, pm, ty, relations - 1, L, 0.1, 128, 6.0,
            True, True, triangle=True, interpret=True)
        cn = pair_count_relations_pallas(
            pr, pm, ty, pr, pm, ty, relations - 1, r_cuts, L, True,
            triangle=True, interpret=True)
        return np.asarray(f), np.asarray(r), np.asarray(cn)

    got2 = run_rel_cn()
    for g, w in zip(got2, want[:3]):
        np.testing.assert_array_equal(g, w)


def test_rel_sharded_triangle_two_shards_sum_to_dense():
    """Row-sharded relation kernel (cyclic-half rule with explicit
    global row_tiles): per-shard (full, rels) summed must equal the
    dense scatter projection exactly."""
    from mdproptools_tpu.ops.pairs_pallas import pair_hist_relations_pallas

    rng = np.random.default_rng(37)
    for n, box in ((700, 14.0), (520, 13.0)):  # 6 and 5 padded tiles
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        codes = rng.integers(1, 4, n)
        lay = pair_ops.build_type_layout(codes, 3)
        pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
        L = jnp.full(3, box, jnp.float32)
        relations = np.array([[1, 2], [3, 3]])
        n_pad = -(-n // 128) * 128
        pm = pair_ops.device_sort_orb(jnp.asarray(pos), n, n_pad, L)
        pr = pair_ops.gather_padded_perm(jnp.asarray(pos), pm)
        codes0 = jnp.asarray(codes - 1, jnp.float32)
        ty = jnp.where(pm >= 0, codes0[jnp.maximum(pm, 0)], -1.0)
        nc = n_pad // 128
        k = nc // 2
        tot_full = 0
        tot_rels = 0
        for sl in (slice(0, k * 128), slice(k * 128, nc * 128)):
            rt = jnp.arange(nc, dtype=jnp.int32)[sl.start // 128:
                                                 (sl.stop - 1) // 128 + 1]
            f, r = pair_hist_relations_pallas(
                pr[sl], pm[sl], ty[sl], pr, pm, ty, relations - 1, L,
                0.1, 128, 6.0, True, True, triangle=True, interpret=True,
                row_tiles=rt)
            tot_full = tot_full + np.asarray(f)
            tot_rels = tot_rels + np.asarray(r)
        hist = pair_ops.pair_hist(pp, pp, lay, lay, L, 0.1, 128, 6.0,
                                  True, dtype=jnp.float32,
                                  method="scatter")
        wfull, wrels = pair_ops.project_relations(hist, relations, True)
        np.testing.assert_array_equal(tot_full, np.asarray(wfull))
        np.testing.assert_array_equal(tot_rels, np.asarray(wrels))


def test_orb_sort_valid_and_kernel_parity():
    """Balanced-ORB sort: (a) a valid permutation with pads last, (b)
    tiles no fatter than Hilbert's in the median, (c) the relation
    kernel through the ORB layout equals the dense scatter projection."""
    from mdproptools_tpu.ops.pairs_pallas import (
        _tile_geometry, pair_hist_relations_pallas,
    )

    rng = np.random.default_rng(31)
    n, box = 900, 16.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    L = jnp.full(3, box, jnp.float32)
    n_pad = -(-n // 128) * 128

    pm = np.asarray(pair_ops.device_sort_orb(jnp.asarray(pos), n, n_pad, L))
    real = pm[pm >= 0]
    assert len(real) == n and len(np.unique(real)) == n
    # pads sink to the tail tile(s): every tile before the last real
    # one is fully dense
    occ = (pm.reshape(-1, 128) >= 0).sum(axis=1)
    nz = np.nonzero(occ)[0]
    assert (occ[nz[:-1]] == 128).all()

    def med_radius(perm):
        prn = pair_ops.gather_padded_perm(jnp.asarray(pos), jnp.asarray(perm))
        nt = n_pad // 128
        _, r = _tile_geometry(prn.reshape(nt, 128, 3),
                              jnp.asarray(perm).reshape(nt, 128), L)
        r = np.asarray(r)
        return np.median(r[occ > 0])

    pmh = pair_ops.device_sort_global(
        jnp.asarray(pos), n, n_pad, L, pair_ops.pick_ncell(n))
    assert med_radius(pm) <= med_radius(np.asarray(pmh)) * 1.05

    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    relations = np.array([[1, 2], [3, 3]])
    hist = pair_ops.pair_hist(pp, pp, lay, lay, L, 0.1, 128, 6.0, True,
                              dtype=jnp.float32, method="scatter")
    wfull, wrels = pair_ops.project_relations(hist, relations, True)
    pr = pair_ops.gather_padded_perm(jnp.asarray(pos), jnp.asarray(pm))
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    pmj = jnp.asarray(pm)
    ty = jnp.where(pmj >= 0, codes0[jnp.maximum(pmj, 0)], -1.0)
    gfull, grels = pair_hist_relations_pallas(
        pr, pmj, ty, pr, pmj, ty, relations - 1, L, 0.1, 128, 6.0,
        True, True, triangle=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(grels), np.asarray(wrels))
    np.testing.assert_array_equal(np.asarray(gfull), np.asarray(wfull))


def test_host_sort_orb_valid_quality_and_kernel_parity():
    """Host (NumPy) balanced-ORB twin: (a) a valid permutation with pads
    sunk to the tail tiles, (b) tile radii no fatter than the device
    ORB's in the median (same bisection contract), (c) the relation
    kernel through the host layout equals the dense scatter projection
    exactly (any permutation is exact)."""
    from mdproptools_tpu.ops.pairs_pallas import (
        _tile_geometry, pair_hist_relations_pallas,
    )

    rng = np.random.default_rng(47)
    n, box = 900, 16.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    L = jnp.full(3, box, jnp.float32)
    n_pad = -(-n // 128) * 128

    pm = pair_ops.host_sort_orb(pos, n, n_pad)
    assert pm.dtype == np.int32 and pm.shape == (n_pad,)
    real = pm[pm >= 0]
    assert len(real) == n and len(np.unique(real)) == n
    occ = (pm.reshape(-1, 128) >= 0).sum(axis=1)
    nz = np.nonzero(occ)[0]
    assert (occ[nz[:-1]] == 128).all()

    def med_radius(perm):
        prn = pair_ops.gather_padded_perm(jnp.asarray(pos),
                                          jnp.asarray(perm))
        nt = n_pad // 128
        _, r = _tile_geometry(prn.reshape(nt, 128, 3),
                              jnp.asarray(perm).reshape(nt, 128), L)
        return np.median(np.asarray(r)[occ > 0])

    pmd = np.asarray(pair_ops.device_sort_orb(jnp.asarray(pos), n,
                                              n_pad, L))
    assert med_radius(pm) <= med_radius(pmd) * 1.05

    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    relations = np.array([[1, 2], [3, 3]])
    hist = pair_ops.pair_hist(pp, pp, lay, lay, L, 0.1, 128, 6.0, True,
                              dtype=jnp.float32, method="scatter")
    wfull, wrels = pair_ops.project_relations(hist, relations, True)
    pmj = jnp.asarray(pm)
    pr = pair_ops.gather_padded_perm(jnp.asarray(pos), pmj)
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    ty = jnp.where(pmj >= 0, codes0[jnp.maximum(pmj, 0)], -1.0)
    gfull, grels = pair_hist_relations_pallas(
        pr, pmj, ty, pr, pmj, ty, relations - 1, L, 0.1, 128, 6.0,
        True, True, triangle=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(grels), np.asarray(wrels))
    np.testing.assert_array_equal(np.asarray(gfull), np.asarray(wfull))


@pytest.mark.parametrize("exclude_self,triangle", [
    (True, False), (True, True), (False, False), (False, True),
])
def test_cn_kernel_matches_pair_count_within(exclude_self, triangle):
    """Relation-count (CN) kernel: exact per-relation cutoffs on mixed
    Hilbert tiles must equal pair_count_within in every mode."""
    from mdproptools_tpu.ops.pairs_pallas import pair_count_relations_pallas

    rng = np.random.default_rng(29)
    n, box = 700, 14.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    codes = rng.integers(1, 4, n)
    lay = pair_ops.build_type_layout(codes, 3)
    pp = pair_ops.gather_padded(jnp.asarray(pos), lay)
    L = jnp.full(3, box, jnp.float32)
    relations = np.array([[1, 2], [3, 3], [2, 1], [1, 1]])
    r_cuts = np.array([3.0, 4.5, 2.0, 3.5])
    counts = np.bincount(codes - 1, minlength=3)

    n_pad = -(-n // 128) * 128
    pm = pair_ops.device_sort_global(
        jnp.asarray(pos), n, n_pad, L, pair_ops.pick_ncell(n))
    pr = pair_ops.gather_padded_perm(jnp.asarray(pos), pm)
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    ty = jnp.where(pm >= 0, codes0[jnp.maximum(pm, 0)], -1.0)

    want = np.asarray(pair_ops.pair_count_within(
        pp, pp, lay, lay, L, relations, r_cuts, exclude_self,
        dtype=jnp.float32))
    got = np.asarray(pair_count_relations_pallas(
        pr, pm, ty, pr, pm, ty, relations - 1, r_cuts, L,
        exclude_self, triangle=triangle, interpret=True,
        counts_r=counts))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("triangle", [False, True])
def test_relation_kernel_exact_bins_matches_f64_oracle(triangle):
    """exact_bins: the kernel fed (hi, lo) split f64 positions must
    produce COUNTS bit-equal to the float64 reference loop, including
    pairs planted within 1e-9..1e-7 of bin edges and of r_cut (where
    the plain f32 kernel demonstrably flips bins)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import oracle

    from mdproptools_tpu.ops import dfloat
    from mdproptools_tpu.ops.pairs_pallas import pair_hist_relations_pallas

    rng = np.random.default_rng(19)
    box = 14.3
    r_cut, bin_size, n_bins = 6.0, 0.1, 60
    base = rng.uniform(0, box, (600, 3))
    planted = []
    for m in range(1, 60, 3):
        for d in (1e-9, -1e-9, 1e-7, -1e-7):
            o = rng.uniform(2, 12, 3)
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            planted += [o, o + u * (m * bin_size + d)]
    for d in (1e-9, -1e-9):  # r_cut edge
        o = rng.uniform(2, 8, 3)
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        planted += [o, o + u * (r_cut + d)]
    pos = np.concatenate([base, np.array(planted)])
    n = pos.shape[0]
    codes = rng.integers(1, 4, n)
    L64 = np.full(3, box)
    relations = np.array([[1, 2], [3, 3], [1, 1]])
    counts = np.bincount(codes - 1, minlength=3)

    wfull, wrels = oracle.rdf_loop(pos, codes, L64, r_cut, bin_size,
                                   [(int(a), int(b)) for a, b in relations])

    n_pad = -(-n // 128) * 128
    L32 = jnp.asarray(L64, jnp.float32)
    pm = pair_ops.device_sort_global(
        jnp.asarray(pos, jnp.float32), n, n_pad, L32,
        pair_ops.pick_ncell(n))
    perm = np.asarray(pm)
    pr64 = np.where(perm[:, None] >= 0, pos[np.maximum(perm, 0)], 0.0)
    hi, lo = dfloat.split_hi_lo(pr64)
    Lh, Ll = dfloat.split_hi_lo(L64)
    codes0 = jnp.asarray(codes - 1, jnp.float32)
    ty = jnp.where(pm >= 0, codes0[jnp.maximum(pm, 0)], -1.0)

    gfull, grels = pair_hist_relations_pallas(
        jnp.asarray(hi), pm, ty, jnp.asarray(hi), pm, ty,
        relations - 1, jnp.asarray(Lh), bin_size, n_bins, r_cut,
        exclude_self=True, with_full=True, triangle=triangle,
        interpret=True, counts_r=counts,
        pos_r_lo=jnp.asarray(lo), pos_c_lo=jnp.asarray(lo),
        lengths_lo=jnp.asarray(Ll),
    )
    np.testing.assert_array_equal(np.asarray(gfull), wfull)
    np.testing.assert_array_equal(np.asarray(grels), wrels)

    # vacuity check: the plain f32 kernel must NOT match on this input
    g32full, _ = pair_hist_relations_pallas(
        jnp.asarray(hi), pm, ty, jnp.asarray(hi), pm, ty,
        relations - 1, L32, bin_size, n_bins, r_cut,
        exclude_self=True, with_full=True, triangle=triangle,
        interpret=True, counts_r=counts,
    )
    assert np.abs(np.asarray(g32full) - wfull).sum() > 0
