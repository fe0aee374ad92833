"""
Fused Pallas TPU kernel for the ordered-pair distance histogram.

Why: the XLA path materializes the radix one-hot matrices (P x 128 per
frame, tens of GB at 50k atoms) through HBM, which dominates runtime.
This kernel fuses minimum-image pair math + binning + one-hot + MXU
accumulation inside VMEM: the only HBM traffic is positions in and the
(types x types x bins) histogram out.

Shape strategy (Mosaic-friendly, all 2-D):
- 2-D grid over (row chunk i, column tile j): one program per 128x128
  pair tile, with both position blocks delivered by BlockSpec-pipelined
  DMAs (in-kernel dynamic slices of a long VMEM row cost O(n_tiles)
  per load and made the kernel O(N^3) at 50k atoms — the grid form is
  O(N^2) with prefetch overlap);
- the chunk/tile type codes and the cull bitmask arrive via scalar
  prefetch (SMEM); each tile is single-typed by ``TypeLayout``;
- the row chunk's coordinates are transposed once to (LANE, 1) so PAIRS
  LIVE ON SUBLANES; pair math and the radix split are batched over the
  whole (LANE, F) tile; a lane roll walks the tile's columns in groups
  of ``C_GROUP``, each column one (LANE, 1) static slice whose radix
  one-hots are plain 2-D compares against lane iotas (oh_lo (LANE, 128),
  oh_hi (LANE, 8));
- each column is one small MXU dot oh_hi^T @ oh_lo -> (8, 128) f32 into
  C_GROUP INDEPENDENT accumulators (pipelined), and the tile's total is
  added to the persistent VMEM output at sublane rows
  [(ta * n_codes_c + tb) * H_SUB, +H_SUB).

Work skipping (exact, never changes counts):
- tile cull: per frame, XLA computes bounding spheres (torus metric) of
  every row chunk and column tile and bit-packs a conservative
  (n_chunks, n_tiles) keep mask (``_cull_mask_words``); the kernel's
  skip test is two scalar SMEM ops + a branch. (An earlier variant
  recomputed sphere/column distances with vector reductions inside
  every program — measured 4.2 us/program of pure overhead at 42k
  atoms, wiping out the cull's win.) With spatially-sorted layouts
  (``pairs.device_sort_perm``) this is the O(N^2) -> O(N * n_near)
  lever;
- triangle (self case): each unordered slot pair is counted once
  (tiles j > i whole; tile j == i restricted to its strictly-upper slot
  half, folded into the keep mask) and the wrapper mirrors
  hist + hist^T, halving pair work; r = 0 self pairs are re-added
  analytically when exclude_self=False.

Mosaic lessons encoded here: no reshapes that change the lane dim, no
dynamic slicing of values, dynamic REF slices must be 128-aligned on
lanes (and cost O(row length) — use the grid instead), static unrolls
allocate fresh stack VMEM per iteration (use fori_loop), pltpu.roll
shift must be non-negative, per-program vector reductions are ~us-scale
overhead (hoist them to XLA and prefetch scalars).

Semantics identical to ``pairs.pair_hist_rows`` (fast/f32 path):
bin = trunc(sqrt(rsq)/bin_size), keep rsq < r_cut^2 and bin < n_bins,
pad slots and (optionally) self pairs excluded via original-index masks.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdproptools_tpu.ops import dfloat
from mdproptools_tpu.ops.pairs import LANE, TypeLayout
from mdproptools_tpu.ops.pbc import minimum_image

F = 128  # radix-lo width == lane width == column tile width
H_SUB = 8  # sublane-padded radix-hi size (supports n_bins <= 1024)
C_GROUP = 64  # independent column dots per fori iteration
KC = 32  # column tiles per grid program (fixed ~4.5 us/program dispatch
#         overhead measured on v5e — amortize it over KC tiles; each
#         subtile keeps its own cull bit and skip branch)
CULL_MARGIN = 0.1  # Angstrom slack absorbing f32 rounding in the mask

def _srl(w, n):
    # int32 shift-amount operand (a bare Python literal promotes to int64
    # under the x64 test config and lax requires matching dtypes)
    return jax.lax.shift_right_logical(w, jnp.int32(n))


def _popcount32(w):
    """SWAR popcount of a scalar int32 (Mosaic has no scalar
    population_count). Used as the exact trip count of the kept-subtile
    loops: the loop runs once per SET bit, so culled subtiles cost
    nothing at all (the earlier bit-gated zero-trip form still paid
    ~2.3 us of loop/branch overhead per CULLED subtile)."""
    w = w - (_srl(w, 1) & jnp.int32(0x55555555))
    w = (w & jnp.int32(0x33333333)) + (_srl(w, 2) & jnp.int32(0x33333333))
    w = (w + _srl(w, 4)) & jnp.int32(0x0F0F0F0F)
    return _srl(w * jnp.int32(0x01010101), 24)


def _ctz32(w):
    """Index of the lowest set bit (undefined at w == 0, never called
    there: the popcount trip count guards it)."""
    return _popcount32((w & (-w)) - jnp.int32(1))


def _tile_geometry(p, idx, lengths):
    """Bounding spheres (torus metric) of (n, T, 3) position tiles.
    Returns (centers (n, 3), radii (n,)); pad slots (idx < 0) excluded.
    All-pad tiles get radius 0 (their pairs are masked in-kernel)."""
    valid = (idx >= 0).astype(p.dtype)[..., None]  # (n, T, 1)
    ref = p[:, :1, :]
    d = minimum_image(p - ref, lengths) * valid
    nv = jnp.maximum(valid.sum(axis=1), 1.0)  # (n, 1)
    m = d.sum(axis=1) / nv  # (n, 3)
    c = ref[:, 0, :] + m
    rad2 = (((d - m[:, None, :]) ** 2).sum(-1) * valid[..., 0]).max(axis=1)
    return c, jnp.sqrt(rad2)


def _triangle_keep(row_tiles, n_tiles):
    """Cyclic-half assignment of unordered tile pairs: row tile i
    processes column tile j iff d = (j - i) mod n_tiles is in
    (0, ceil(n/2)] (ties at d == n/2 for even n broken by i < j), plus
    its own diagonal tile (d == 0, restricted in-kernel to the strictly-
    upper slot half). Every unordered pair is processed exactly once AND
    every row tile gets (nearly) the same tile count — so triangle mode
    stays load-balanced under any row sharding (unlike j >= i, where row
    0 does all the work and the last row none)."""
    j = jnp.arange(n_tiles)[None, :]
    i = row_tiles[:, None]
    d = jnp.mod(j - i, n_tiles)
    half = n_tiles // 2
    if n_tiles % 2 == 0:
        keep = (d > 0) & ((d < half) | ((d == half) & (i < j)))
    else:
        keep = (d > 0) & (d <= half)
    return keep | (d == 0)


def _cull_mask_words(pos_r, idx_r, pos_c3, idx_c3, lengths, r_cut, triangle,
                     kc=None, row_tiles=None):
    """Bit-packed conservative keep mask: word [i, g] bit k covers
    (row chunk i, column tile g * KC + k) — one word per grid program,
    so an all-culled program skips with a single scalar load + branch
    (each taken branch costs ~4 us of vector-pipeline overhead; kept
    tiles cluster under the Morton sort, so most programs are all-empty
    or all-full). A tile pair is kept iff the center distance can be
    within r_cut of some atom pair: D <= r_cut + rad_i + rad_j + margin
    (triangle inequality in the torus metric). Triangle mode
    additionally drops j < i; n_tiles must already be a KC multiple."""
    cr, rr = _tile_geometry(pos_r, idx_r, lengths)
    cc, rc = _tile_geometry(pos_c3, idx_c3, lengths)
    d = minimum_image(cr[:, None, :] - cc[None, :, :], lengths)
    dist = jnp.sqrt((d * d).sum(-1))
    keep = dist <= (r_cut + CULL_MARGIN) + rr[:, None] + rc[None, :]
    keep &= (idx_r >= 0).any(axis=1)[:, None]  # all-pad chunks/tiles
    keep &= (idx_c3 >= 0).any(axis=1)[None, :]
    n_chunks, n_tiles = keep.shape
    if triangle:
        if row_tiles is None:
            row_tiles = jnp.arange(n_chunks)
        keep &= _triangle_keep(jnp.asarray(row_tiles), n_tiles)
    kc = KC if kc is None else kc
    bits = keep.reshape(n_chunks, n_tiles // kc, kc).astype(jnp.int32)
    weights = jnp.int32(1) << jnp.arange(kc, dtype=jnp.int32)
    return (bits * weights[None, None, :]).sum(axis=2, dtype=jnp.int32)


def _kernel(
    # scalar prefetch (SMEM)
    chunk_codes_ref,  # (n_chunks,) i32 row-chunk type codes
    tile_codes_ref,  # (n_tiles,) i32 column-tile type codes
    mask_ref,  # (n_chunks, n_words) i32 bit-packed keep mask
    row_tiles_ref,  # (n_chunks,) i32 GLOBAL tile index per row chunk
    #                 (== arange unsharded; a shard's gathered positions
    #                 under row sharding)
    # inputs
    rows_ref,  # (1, 3, LANE) f32: row chunk x/y/z
    idxr_ref,  # (1, 1, LANE) i32
    colpack_ref,  # (n_groups, 4, KC * F) f32, FULLY VMEM-RESIDENT:
    #               sublanes 0-2 = x/y/z, 3 = original index as float
    #               (exact for < 2^24 atoms). Constant index_map -> one
    #               DMA per pallas_call: per-program column-block DMAs
    #               measured ~2.1 us/KB un-pipelined on v5e/axon and
    #               dominated the kernel at 42k atoms.
    len_ref,  # (1, 3) f32 box lengths (SMEM)
    # output
    out_ref,  # (n_codes_r * n_codes_c * H_SUB, F) f32, persistent block
    *,
    n_codes_c,
    bin_size,
    n_bins,
    r_cut,
    exclude_self,
    triangle,
    compact_cols=False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tail_on = compact_cols and C_GROUP > TAIL_GROUP

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    word = mask_ref[i, j]  # this program's KC keep bits

    # Data-dependent fori trip counts, NOT pl.when: a pl.when whose body
    # contains a loop gets PREDICATED by Mosaic (the body executes with
    # stores masked), so gated programs still paid full tile cost. The
    # outer loop runs 0/1 times (skips all-culled programs before the
    # row setup); the subtile loop walks exactly the SET bits of the keep
    # word via popcount/ctz, so culled subtiles cost nothing at all (the
    # earlier per-bit zero-trip gate cost ~2.3 us per CULLED subtile,
    # which erased most of the cull's win at moderate kept fractions).
    def _group(_g, carry_g):
        ta = chunk_codes_ref[i]
        lx = len_ref[0, 0]
        ly = len_ref[0, 1]
        lz = len_ref[0, 2]
        # rows to sublanes: (LANE, 1)
        xr = rows_ref[0, 0, :].reshape(1, LANE).T
        yr = rows_ref[0, 1, :].reshape(1, LANE).T
        zr = rows_ref[0, 2, :].reshape(1, LANE).T
        idxr = idxr_ref[0, 0, :].reshape(1, LANE).T.astype(jnp.float32)
        rc2 = jnp.float32(r_cut * r_cut)
        inv_ddr = jnp.float32(1.0 / bin_size)

        def wrap(d, L):
            half = L * jnp.float32(0.5)
            return jnp.where(d > half, d - L,
                             jnp.where(d < -half, d + L, d))

        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LANE, F), 1)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (LANE, H_SUB), 1)

        def subtile(_t, w):  # runs once per SET bit of the keep word
            k = _ctz32(w)
            jj = j * KC + k  # global column tile index
            # lane slices of the resident pack (128-aligned, short row)
            off = pl.multiple_of(k * F, F)
            xc = colpack_ref[j, 0, pl.ds(off, F)]  # (F,)
            yc = colpack_ref[j, 1, pl.ds(off, F)]
            zc = colpack_ref[j, 2, pl.ds(off, F)]
            idxc = colpack_ref[j, 3, pl.ds(off, F)]  # float indices
            tb = tile_codes_ref[jj]

            dx = wrap(xr - xc[None, :], lx)  # (LANE, F)
            dy = wrap(yr - yc[None, :], ly)
            dz = wrap(zr - zc[None, :], lz)
            rsq = dx * dx + dy * dy + dz * dz
            b = (jnp.sqrt(rsq) * inv_ddr).astype(jnp.int32)
            valid = (rsq < rc2) & (b < n_bins)
            valid &= (idxr >= 0) & (idxc[None, :] >= 0)
            if triangle:
                # diagonal tile (jj == this chunk's GLOBAL tile):
                # count each unordered slot pair once
                valid &= (iota_lo > jax.lax.broadcasted_iota(
                    jnp.int32, (LANE, F), 0)) | (jj != row_tiles_ref[i])
            if exclude_self:
                valid &= idxr != idxc[None, :]
            # radix split batched over the whole tile ((LANE, 1)-shaped
            # ops inside the column loop run at 1/128 lane efficiency,
            # so hoist everything hoistable); invalid pairs get radix-hi
            # H_SUB, which selects an all-zero one-hot row
            hi_t = jnp.where(valid, jax.lax.div(b, jnp.int32(F)), H_SUB)
            lo_t = b - jax.lax.div(b, jnp.int32(F)) * jnp.int32(F)

            # C_GROUP columns per fori iteration, one small MXU dot each
            # into C_GROUP INDEPENDENT accumulators (no dependency
            # chain, so the dots pipeline); a lane roll walks the tile.
            # fori_loop (not a full static unroll) so Mosaic reuses
            # scratch buffers.
            def make_group_body(width):
                def group_body(g, carry):
                    hi_c, lo_c, accs = carry
                    new_accs = []
                    for q in range(width):
                        oh_hi = (hi_c[:, q:q + 1] == iota_hi).astype(
                            jnp.bfloat16)
                        oh_lo = (lo_c[:, q:q + 1] == iota_lo).astype(
                            jnp.bfloat16)
                        new_accs.append(accs[q] + jax.lax.dot_general(
                            oh_hi,
                            oh_lo,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))  # (H_SUB, F)
                    return (
                        pltpu.roll(hi_c, F - width, 1),
                        pltpu.roll(lo_c, F - width, 1),
                        tuple(new_accs),
                    )

                return group_body

            if compact_cols:
                # Column compaction (see the rel kernel for the full
                # rationale): pack columns with >= 1 valid pair to the
                # front via a one-hot permutation matmul (hi/lo < 256,
                # exact in bf16) and walk only ceil(n_act) columns.
                # Invalid pairs carry hi = H_SUB (all-zero oh_hi row),
                # so only hi needs re-masking where the permutation
                # yields empty columns (they produce hi = 0, a real
                # row); garbage lo there is harmless under a zero
                # oh_hi.
                act = jnp.max(valid.astype(jnp.int32), axis=0,
                              keepdims=True)  # (1, F)
                ps = act  # inclusive lane prefix sum by log2 F rolls
                lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
                s = 1
                while s < F:
                    ps = ps + jnp.where(lane1 >= s,
                                        pltpu.roll(ps, s, 1), 0)
                    s *= 2
                n_act = jnp.sum(act)  # scalar trip-count source
                dst_t = (ps - 1).reshape(1, F).T  # (F, 1)
                act_t = act.reshape(1, F).T
                iota_ff = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
                perm = ((iota_ff == dst_t) & (act_t > 0)).astype(
                    jnp.bfloat16)

                def _permute(a):
                    return jax.lax.dot_general(
                        a.astype(jnp.bfloat16), perm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)

                lane_mask = iota_lo < n_act
                lo_t = _permute(lo_t)
                hi_t = jnp.where(lane_mask, _permute(hi_t),
                                 jnp.int32(H_SUB))
                n_grp = n_act // jnp.int32(C_GROUP)
                rem = n_act - n_grp * jnp.int32(C_GROUP)
                if tail_on:
                    n_tail = ((rem + jnp.int32(TAIL_GROUP - 1))
                              // jnp.int32(TAIL_GROUP))
                else:
                    n_grp = ((n_act + jnp.int32(C_GROUP - 1))
                             // jnp.int32(C_GROUP))
                    n_tail = None
            else:
                n_grp = F // C_GROUP
                n_tail = None

            accs0 = tuple(
                jnp.zeros((H_SUB, F), jnp.float32)
                for _ in range(C_GROUP)
            )
            hi_a, lo_a, accs = jax.lax.fori_loop(
                0, n_grp, make_group_body(C_GROUP), (hi_t, lo_t, accs0)
            )
            total = accs[0]
            for a in accs[1:]:
                total = total + a
            if n_tail is not None:
                tail_accs0 = tuple(
                    jnp.zeros((H_SUB, F), jnp.float32)
                    for _ in range(TAIL_GROUP)
                )
                _, _, tail_accs = jax.lax.fori_loop(
                    0, n_tail, make_group_body(TAIL_GROUP),
                    (hi_a, lo_a, tail_accs0)
                )
                for a in tail_accs:
                    total = total + a
            row = (ta * n_codes_c + tb) * H_SUB
            cur = out_ref[pl.ds(row, H_SUB), :]
            out_ref[pl.ds(row, H_SUB), :] = cur + total
            return w & (w - 1)

        jax.lax.fori_loop(0, _popcount32(word), subtile, word)
        return carry_g

    jax.lax.fori_loop(0, (word != 0).astype(jnp.int32), _group, 0)


def pair_hist_rows_pallas(
    pos_r,  # (n_chunks, LANE, 3)
    idx_r,  # (n_chunks, LANE) int32
    chunk_codes,  # (n_chunks,) int32
    pos_c,  # (n_padded_c, 3)
    layout_c: TypeLayout,
    n_codes_r: int,
    lengths,  # (3,)
    bin_size: float,
    n_bins: int,
    r_cut: float,
    exclude_self: bool,
    interpret: bool = False,
    idx_c=None,
    triangle: bool = False,
    row_tiles=None,
    compact_cols: bool = False,
):
    """Pallas implementation of ``pairs.pair_hist_rows`` (f32).

    ``compact_cols``: in-kernel column compaction (identical scheme to
    the relation kernel — active columns front-packed by a one-hot
    permutation matmul, dots walked only to n_act in main+tail groups).
    Only pays when the layout is spatially sorted within type blocks
    (``pairs.device_sort_perm``): then kept tiles near the cull boundary
    have most columns out of range, and skipping their dots converts the
    tile-granularity dilation into column-granularity. Exact: results
    are bit-identical with it on or off.

    Returns (n_codes_r, n_codes_c, n_bins) float32. ``interpret`` runs
    the kernel in the Pallas interpreter (CPU test path). ``idx_c``
    overrides the column permutation (per-frame spatially-sorted
    layouts); defaults to ``layout_c.perm``.

    ``triangle``: self-case optimization — rows and columns must be the
    SAME padded set in the SAME order (full rows, not a shard). Each
    unordered slot pair is counted once and mirrored by the histogram
    symmetry hist[ta, tb, k] == hist[tb, ta, k] (minimum-image distance
    is symmetric), halving the pair work. With ``exclude_self=False``
    the r = 0 self pairs are re-added analytically (count_b at bin 0 of
    each [tb, tb]).

    ``row_tiles``: (n_chunks,) GLOBAL column-tile index of each row
    chunk. Defaults to arange (the unsharded self case). Under row
    sharding, pass each shard's positions in the all-gathered column
    order; the cyclic-half triangle rule then still counts every
    unordered tile pair exactly once across shards, with near-equal
    work per shard (sum the per-shard results / psum over the mesh).
    The r = 0 self-pair re-add must happen once globally, so sharded
    triangle requires exclude_self=True.
    """
    n_chunks = pos_r.shape[0]
    n_codes_c = layout_c.n_codes
    # column tiling follows the ACTUAL array (a mesh caller may have
    # padded beyond the layout with inert rows); layout-derived metadata
    # is extended with inert entries below
    n_tiles = pos_c.shape[0] // F
    n_extra = n_tiles - layout_c.n_padded // F
    if n_bins > H_SUB * F:
        raise ValueError(f"n_bins {n_bins} > {H_SUB * F} unsupported")
    sharded_rows = row_tiles is not None
    if triangle:
        if n_codes_r != n_codes_c:
            raise ValueError("triangle mode requires matching type spaces")
        if not sharded_rows and n_chunks != n_tiles:
            raise ValueError(
                "triangle mode requires rows == columns (full self case) "
                "or explicit row_tiles for a row shard"
            )
        if sharded_rows and not exclude_self:
            raise ValueError(
                "sharded triangle requires exclude_self=True (the r=0 "
                "self-pair re-add must happen exactly once globally)"
            )
    if row_tiles is None:
        row_tiles = jnp.arange(n_chunks, dtype=jnp.int32)
    row_tiles = jnp.asarray(row_tiles, jnp.int32)

    pos_r = pos_r.astype(jnp.float32)
    pos_c3 = pos_c.astype(jnp.float32).reshape(n_tiles, F, 3)
    idx_r = idx_r.astype(jnp.int32)
    if idx_c is None:
        idx_c = jnp.asarray(layout_c.perm, jnp.int32)
        if n_extra:
            idx_c = jnp.concatenate(
                [idx_c, jnp.full(n_extra * F, -1, jnp.int32)])
    idx_c3 = idx_c.astype(jnp.int32).reshape(n_tiles, F)
    lengths = jnp.asarray(lengths, jnp.float32)
    tile_codes_np = np.asarray(layout_c.chunk_codes, np.int32)
    if n_extra:
        tile_codes_np = np.concatenate(
            [tile_codes_np, np.zeros(n_extra, np.int32)])

    # pad the column tiles to a KC multiple with inert tiles (idx -1,
    # keep bit 0 via the all-pad guard in _cull_mask_words)
    pad_tiles = (-n_tiles) % KC
    if pad_tiles:
        pos_c3 = jnp.concatenate(
            [pos_c3, jnp.zeros((pad_tiles, F, 3), pos_c3.dtype)])
        idx_c3 = jnp.concatenate(
            [idx_c3, jnp.full((pad_tiles, F), -1, jnp.int32)])
        tile_codes_np = np.concatenate(
            [tile_codes_np, np.zeros(pad_tiles, np.int32)])
    n_tiles_p = n_tiles + pad_tiles

    mask_words = _cull_mask_words(
        pos_r, idx_r, pos_c3, idx_c3, lengths, float(r_cut), triangle,
        row_tiles=row_tiles)

    rows = jnp.transpose(pos_r, (0, 2, 1))  # (n_chunks, 3, LANE)
    idxr = idx_r[:, None, :]  # (n_chunks, 1, LANE)
    # VMEM-resident column pack (n_groups, 4, KC*F): sublanes x/y/z/idxf;
    # (n_tiles_p, F) -> (groups, KC*F) keeps tile-major lane order
    n_groups = n_tiles_p // KC
    comps = [pos_c3[:, :, c].reshape(n_groups, KC * F) for c in range(3)]
    comps.append(idx_c3.astype(jnp.float32).reshape(n_groups, KC * F))
    colpack = jnp.stack(comps, axis=1)  # (n_groups, 4, KC*F)
    tile_codes = jnp.asarray(tile_codes_np)

    kernel = functools.partial(
        _kernel,
        n_codes_c=n_codes_c,
        bin_size=float(bin_size),
        n_bins=int(n_bins),
        r_cut=float(r_cut),
        exclude_self=bool(exclude_self),
        triangle=bool(triangle),
        compact_cols=bool(compact_cols),
    )
    chunk_codes = chunk_codes.astype(jnp.int32)

    def _call(cc_b, mask_b, rt_b, rows_b, idxr_b):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(rows_b.shape[0], n_groups),
            in_specs=[
                pl.BlockSpec((1, 3, LANE), lambda i, j, *s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, LANE), lambda i, j, *s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                # whole column pack resident in VMEM (constant index ->
                # one DMA for the entire grid)
                pl.BlockSpec((n_groups, 4, KC * F),
                             lambda i, j, *s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_codes_r * n_codes_c * H_SUB, F),
                lambda i, j, *s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_codes_r * n_codes_c * H_SUB, F), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )(cc_b, tile_codes, mask_b, rt_b, rows_b, idxr_b, colpack,
          lengths.reshape(1, 3))

    rb = _row_block(n_groups)
    out = _call(chunk_codes[:rb], mask_words[:rb],
                row_tiles[:rb], rows[:rb], idxr[:rb])
    for s in range(rb, n_chunks, rb):
        e = min(s + rb, n_chunks)
        rows_b = rows[s:e]
        # serialize block calls so their scoped VMEM stacks never
        # coexist in the schedule (see the rel-kernel wrapper)
        out, rows_b = jax.lax.optimization_barrier((out, rows_b))
        out = out + _call(chunk_codes[s:e], mask_words[s:e],
                          row_tiles[s:e], rows_b, idxr[s:e])
    # (ncr*ncc*H_SUB, F) -> (ncr, ncc, H_SUB*F): sublane-major unflatten
    out = out.reshape(n_codes_r, n_codes_c, H_SUB * F)[:, :, :n_bins]
    if triangle:
        out = out + jnp.transpose(out, (1, 0, 2))
        if not exclude_self:
            # r = 0 self pairs (dropped by the strictly-upper mask):
            # one per real atom, bin 0 of [tb, tb]
            self_counts = jnp.zeros(
                (n_codes_c, n_codes_c), jnp.float32
            ).at[jnp.arange(n_codes_c), jnp.arange(n_codes_c)].set(
                jnp.asarray(layout_c.counts, jnp.float32))
            out = out.at[:, :, 0].add(self_counts)
    return out


# ---------------------------------------------------------------------------
# Relation-projected kernel on MIXED-TYPE tiles (the TPU fast path)
# ---------------------------------------------------------------------------
# Per-type blocks (TypeLayout) give minority species box-sized tiles
# (median tile radius 25 A on the bundled system tiled to 42k atoms), so
# the cull keeps ~96% of tile pairs at r_cut=20 — useless. This kernel
# instead takes atoms in ONE spatially-compact global order (mixed
# types; balanced-ORB box tiles, ``pairs.device_sort_orb``, measure
# ~9.3/9.9/11.1 A med/p90/max radius at the bundled density vs Hilbert's
# 13.4/16.0/20.7 — the tail matters because one fat tile keeps every
# tile pair touching it) and projects the histogram onto exactly the
# rows the RDF needs — [full?] + one row per partial relation — via a
# single fused multi-hot one-hot dot per column:
#
#   row blocks of HB = ceil(n_bins/F) sublanes each:
#     block 0 = REMAINDER (pairs matching no relation), block 1+r =
#     relation r, + 1 trash row;
#   per pair ONE one-hot insert: joint = (rel ? 1+rel : 0)*HB + hi (or
#   trash when invalid) — the full histogram is assembled as the sum
#   over all blocks after the kernel, and in triangle mode the blocks
#   are UNORDERED relations ((a,b)/(b,a) deduplicated; the ordered
#   histograms are equal by pair symmetry, so the wrapper reads
#   rels[r] = block * (2 if a==b else 1) and full = 2 * sum(blocks)).
#   Earlier rounds inserted up to 3 one-hots per pair (full + forward +
#   mirrored); the remainder/unordered encode cut 42k-atom RDF from
#   273 to 198 ms/frame and 84k from 588 to 427 (measured v5e,
#   bit-equal) — the multi-hot build was the kernel's VPU-bound
#   critical path, at ~16 vector-register cycles per one-hot compare
#   per column regardless of m_pad (lanes pad to 128).

ROW_BLOCK = 1024  # cap on row chunks per pallas_call (see _row_block)

COL_GROUP_BLOCK = 24  # column groups (of KC tiles each) per pallas_call.
#                       The column pack is VMEM-resident at groups x 5 x
#                       KC*F x 4 B and its pipeline buffering plus the
#                       kernel's scoped stack must fit the 16 MiB VMEM
#                       budget. Empirical at 671k atoms (measured scoped
#                       sizes: unblocked 164 groups -> 20.5 MiB OOM,
#                       96 -> 24.2 OOM, 48 -> 18.2 OOM, 24 -> compiles
#                       and runs; the accounting is super-linear in the
#                       block size, so derive from measurements, not
#                       arithmetic). Bigger systems iterate column
#                       blocks; the global group offset is scalar-
#                       prefetched so every block shares ONE compiled
#                       kernel, and the block calls are chained with
#                       optimization_barrier so their stacks never
#                       coexist.


def _row_block(n_groups: int) -> int:
    """Row chunks per pallas_call: the scalar-prefetched keep mask lands
    in SMEM padded to 128 lanes per row — rows x max(n_groups, 128) x
    4 B against a 1 MiB SMEM budget — so the block size shrinks as the
    column-group count grows (512 KiB mask budget leaves headroom for
    the other prefetch operands). Larger row sets issue multiple calls
    whose outputs sum exactly (row_tiles carries GLOBAL tile indices,
    so the triangle rule is block-invariant)."""
    return min(ROW_BLOCK, max(8, (1 << 17) // max(n_groups, 128)))

REL_DOT_INT8 = False  # int8 one-hot MXU dots (would ride v5e's 2x int8
#                       MAC rate). MEASURED DEAD END on this backend:
#                       Mosaic refuses i8 vectors outright ("Only
#                       vector<i16> and vector<i32> are supported") —
#                       the one-hot operands can't even materialize in
#                       i8, so the 2x int8 path is unreachable from
#                       Pallas today. Kept as a flag so the experiment
#                       re-runs in one line when Mosaic grows i8.

TAIL_GROUP = 8  # tail-walk width finishing n_act % C_GROUP_REL columns
REL_TAIL_WALK = True  # main+tail column walk (benchmarks A/B this)
REL_LANE_SPLIT = False  # G=2 lane-split column pairing: the histogram
#                        dot's 128-row weight load is its dominant cost
#                        and is per-column; splitting the 128 lanes into
#                        two 64-lane halves lets TWO columns share one
#                        weight load — even columns' lo one-hots live in
#                        lanes [0, 64) and m-rows [0, S), odd columns in
#                        lanes [64, 128) and m-rows [S, 2S) (disjoint
#                        blocks, so the dot's cross terms land in the
#                        other parity's unused quadrant, which the
#                        wrapper never reads). Requires 2*S <= 128 with
#                        S = pad8((1+R)*ceil(n_bins/64)+1); falls back
#                        to the unsplit walk otherwise. MEASURED NEUTRAL
#                        on v5e (42k atoms: 198.0 unsplit vs 193.3
#                        ms/frame; 84k: 426.9 vs 425.8; bit-equal):
#                        Mosaic already pipelines consecutive weight
#                        loads, so halving them is offset by the taller
#                        streamed lhs + its build cost. Kept OFF
#                        (simpler walk, same speed); both paths stay
#                        parity-tested.
REL_FUSE_GROUPS = True  # fold the column-group grid dim into an
#                         in-kernel loop: one program per row chunk
#                         (vs n_chunks x n_groups), saving the fixed
#                         per-program dispatch overhead

REL_ABLATE_WALK = False  # PROFILING ONLY: skip the column-walk dot
#                          loops inside each kept subtile but keep every
#                          preceding stage alive (pair geometry, valid/
#                          relation masks, column compaction). The delta
#                          vs the full kernel isolates the MXU walk's
#                          wall share from the per-subtile VPU/fixed
#                          work — outputs are garbage, never use outside
#                          benchmarks/profile_42k.py.
REL_ABLATE_LEVEL = 0  # PROFILING ONLY: graded early exits inside each
#                       kept subtile (finer than REL_ABLATE_WALK, which
#                       is level 1). 0 = off; 1 = stop after column
#                       compaction (everything but the MXU walk);
#                       2 = stop after the pair-validity mask (skips the
#                       relation/joint-row build and compaction);
#                       3 = stop after the column loads (skips the pair
#                       math too — the per-subtile fixed cost: loop
#                       trip, ctz, VMEM column reads). Consecutive
#                       deltas isolate pair math, relation+compaction,
#                       and fixed cost. Outputs are garbage.

KC_REL = 32  # column tiles per grid program (relation kernel)
C_GROUP_REL = 32  # independent column dots per roll step. The original
#                   16/32/64 sweep (pre-compaction: 528/489/487 ms/frame
#                   at 42k) picked 64; with column compaction + the
#                   main+tail walk the mean kept-subtile active-column
#                   count (~54) never fills a 64-wide main trip, so
#                   everything ran through the 8-wide tail. Re-swept
#                   round 5 on a fixed-permutation interleaved harness
#                   (benchmarks/glue_ab.json, min-of-rounds): 42k
#                   kernel-only ms/frame f32 64/48/32 = 157.9/155.1/
#                   152.7, exact 176.8/175.6/171.4 -> 32.


def _rel_kernel(
    mask_ref,  # (n_chunks, n_groups) i32 keep bits (scalar prefetch)
    row_tiles_ref,  # (n_chunks,) i32 GLOBAL tile index per row chunk
    #                 (arange unsharded; the shard's slice positions in
    #                 the all-gathered global order under row sharding)
    col_off_ref,  # (1,) i32 GLOBAL group offset of this column block
    #               (prefetched, not static, so column blocks share one
    #               compiled kernel)
    rows_ref,  # (1, 5, LANE) f32: x/y/z/idxf/typef — exact_bins packs
    #            (1, 8, LANE): x/y/z/xl/yl/zl/idxf/typef
    colpack_ref,  # (n_groups, 5|8, KC_REL * F) f32, VMEM-resident
    len_ref,  # (1, 3) f32 (SMEM); exact_bins: (2, 3) hi/lo rows
    out_ref,  # (M_pad, F) f32 persistent
    *,
    relations,  # static tuple of 0-based (a, b)
    hb,  # ceil(n_bins / lane_width)
    m_pad,
    bin_size,
    n_bins,
    r_cut,
    exclude_self,
    with_full,
    triangle,
    compact_cols,
    c_group,
    dot_int8=False,
    tail_walk=True,
    inline_groups=None,
    lane_split=False,  # G=2 column pairing (see REL_LANE_SPLIT)
    s_blk=0,  # odd-parity m-row block offset (lane_split only)
    ablate_level=0,  # see REL_ABLATE_LEVEL (profiling only)
    exact_bins=False,  # double-f32 bin/cutoff evaluation (ops.dfloat):
    #                    positions arrive as (hi, lo) f32 pairs and every
    #                    pair bins exactly as the float64 reference loop
):
    i = pl.program_id(0)
    if inline_groups is None:
        j = pl.program_id(1)
    n_rel = len(relations)
    lane_w = F // 2 if lane_split else F
    pairs_per = 2 if lane_split else 1
    trash = jnp.int32((1 + n_rel) * hb)
    # int8 one-hot operands: v5e's MXU runs int8 x int8 -> int32 at 2x
    # the bf16 rate on the weight-load-bound path this kernel sits on;
    # one-hot sums reach at most 3 (exact in int8), per-subtile partial
    # counts fit int32, and the f32 accumulation into out_ref is exact
    # for integer counts
    oh_dtype = jnp.int8 if dot_int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if dot_int8 else jnp.float32
    tail_on = compact_cols and tail_walk and c_group > TAIL_GROUP

    if inline_groups is None:
        @pl.when((i == 0) & (j == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
    else:
        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    def _scan_word(jw, word):

      def _group(_g, carry_g):
        lx = len_ref[0, 0]
        ly = len_ref[0, 1]
        lz = len_ref[0, 2]
        xr = rows_ref[0, 0, :].reshape(1, LANE).T  # (LANE, 1)
        yr = rows_ref[0, 1, :].reshape(1, LANE).T
        zr = rows_ref[0, 2, :].reshape(1, LANE).T
        ia, ta = (6, 7) if exact_bins else (3, 4)
        idxr = rows_ref[0, ia, :].reshape(1, LANE).T
        tyr = rows_ref[0, ta, :].reshape(1, LANE).T
        if exact_bins:
            xrl = rows_ref[0, 3, :].reshape(1, LANE).T
            yrl = rows_ref[0, 4, :].reshape(1, LANE).T
            zrl = rows_ref[0, 5, :].reshape(1, LANE).T
            lxl = len_ref[1, 0]
            lyl = len_ref[1, 1]
            lzl = len_ref[1, 2]
            inv_h, inv_l = dfloat.const_hi_lo(1.0 / np.float64(bin_size))
            rc2_h, rc2_l = dfloat.const_hi_lo(
                np.float64(r_cut) * np.float64(r_cut))
        rc2 = jnp.float32(r_cut * r_cut)
        inv_ddr = jnp.float32(1.0 / bin_size)

        def wrap(d, L):
            half = L * jnp.float32(0.5)
            return jnp.where(d > half, d - L,
                             jnp.where(d < -half, d + L, d))

        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LANE, F), 1)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (LANE, m_pad), 1)
        if lane_split:
            half_mask = iota_lo < jnp.int32(lane_w)
            col_par = jax.lax.rem(iota_lo, jnp.int32(2))  # lane parity

        def subtile(_t, w):  # runs once per SET bit of the keep word
            k = _ctz32(w)
            jj = (col_off_ref[0] + jw) * KC_REL + k
            off = pl.multiple_of(k * F, F)
            xc = colpack_ref[jw, 0, pl.ds(off, F)]  # (F,)
            yc = colpack_ref[jw, 1, pl.ds(off, F)]
            zc = colpack_ref[jw, 2, pl.ds(off, F)]
            idxc = colpack_ref[jw, ia, pl.ds(off, F)]
            tyc = colpack_ref[jw, ta, pl.ds(off, F)]

            if ablate_level == 3:
                # profiling: consume the column loads only — the
                # per-subtile fixed cost (loop trip + ctz + VMEM reads)
                out_ref[...] = (out_ref[...]
                                + (xc + yc + zc + idxc + tyc)[None, :])
                return w & (w - 1)

            if exact_bins:
                xcl = colpack_ref[jw, 3, pl.ds(off, F)]
                ycl = colpack_ref[jw, 4, pl.ds(off, F)]
                zcl = colpack_ref[jw, 5, pl.ds(off, F)]
                b, within = dfloat.pair_bins_df(
                    xr, xrl, yr, yrl, zr, zrl,
                    xc[None, :], xcl[None, :], yc[None, :], ycl[None, :],
                    zc[None, :], zcl[None, :],
                    lx, lxl, ly, lyl, lz, lzl,
                    jnp.float32(inv_h), jnp.float32(inv_l),
                    jnp.float32(rc2_h), jnp.float32(rc2_l),
                )
                valid = within & (b < n_bins)
            else:
                dx = wrap(xr - xc[None, :], lx)  # (LANE, F)
                dy = wrap(yr - yc[None, :], ly)
                dz = wrap(zr - zc[None, :], lz)
                rsq = dx * dx + dy * dy + dz * dz
                b = (jnp.sqrt(rsq) * inv_ddr).astype(jnp.int32)
                valid = (rsq < rc2) & (b < n_bins)
            valid &= (idxr >= 0) & (idxc[None, :] >= 0)
            if triangle:
                # cyclic-half rule: d == 0 (jj == this chunk's GLOBAL
                # tile index) is the diagonal tile
                valid &= (iota_lo > jax.lax.broadcasted_iota(
                    jnp.int32, (LANE, F), 0)) | (jj != row_tiles_ref[i])
            if exclude_self:
                valid &= idxr != idxc[None, :]

            if ablate_level == 2:
                # profiling: consume the pair math + validity mask,
                # skip the relation/joint-row build and compaction
                out_ref[...] = (out_ref[...]
                                + valid[:m_pad, :].astype(jnp.float32))
                return w & (w - 1)

            hi = jax.lax.div(b, jnp.int32(lane_w))
            lo_t = b - hi * jnp.int32(lane_w)
            # exclusive relation match -> joint row blocks (types are
            # small ints stored exactly in f32).
            #
            # Remainder-block encoding (with_full): instead of a
            # separate "full histogram" one-hot per pair (a block-0
            # insert for EVERY valid pair), every valid pair lands in
            # exactly one block — its relation's block, or block 0 (the
            # REMAINDER: pairs matching no relation) — and the wrapper
            # assembles full as the sum over all blocks. In TRIANGLE
            # mode the blocks are additionally UNORDERED relations (the
            # wrapper deduplicates (a,b)/(b,a) and passes unordered
            # pairs here): the ordered (a,b) and (b,a) histograms are
            # equal by pair symmetry, so ONE insert per unordered pair
            # suffices and the wrapper reads rels[r] = block * (2 if
            # a==b else 1), full = 2 * sum(blocks). Together these cut
            # the per-column multi-hot build from 3 compares + 2 adds
            # to ONE compare. Counts are integers in f32, so the
            # regrouped accumulation is bit-exact.
            relb = jnp.zeros((LANE, F), jnp.int32)
            for r, (a_r, b_r) in enumerate(relations):
                m_r = ((tyr == jnp.float32(a_r))
                       & (tyc[None, :] == jnp.float32(b_r)))
                if triangle and a_r != b_r:
                    m_r |= ((tyr == jnp.float32(b_r))
                            & (tyc[None, :] == jnp.float32(a_r)))
                relb = relb + jnp.int32(r + 1) * m_r.astype(jnp.int32)
            j1_t = jnp.where(valid, relb * jnp.int32(hb) + hi, trash)

            def make_group_body(width):
                def group_body(g, carry2):
                    arrs, accs = carry2
                    lo_c = arrs[0]
                    new_accs = []
                    for q in range(width // pairs_per):
                        if lane_split:
                            # one dot covers columns (2q, 2q+1): their
                            # lo targets/j rows are parity-disjoint, so
                            # the dot's cross terms (column A's j row x
                            # column B's lanes) land in quadrants the
                            # wrapper never reads
                            c0 = pairs_per * q
                            ga = lo_c[:, c0:c0 + 1]
                            gb = lo_c[:, c0 + 1:c0 + 2]
                            oh_lo = (jnp.where(half_mask, ga, gb)
                                     == iota_lo).astype(oh_dtype)
                            oh = None
                            for arr in arrs[1:]:
                                for c in (c0, c0 + 1):
                                    t = (arr[:, c:c + 1]
                                         == iota_m).astype(oh_dtype)
                                    oh = t if oh is None else oh + t
                        else:
                            oh = (arrs[1][:, q:q + 1] == iota_m).astype(
                                oh_dtype)
                            for extra in arrs[2:]:
                                oh = oh + (extra[:, q:q + 1]
                                           == iota_m).astype(oh_dtype)
                            oh_lo = (lo_c[:, q:q + 1] == iota_lo).astype(
                                oh_dtype)
                        new_accs.append(accs[q] + jax.lax.dot_general(
                            oh, oh_lo,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=acc_dtype,
                        ))  # (m_pad, F)
                    rolled = tuple(
                        pltpu.roll(a, F - width, 1) for a in arrs)
                    return (rolled, tuple(new_accs))

                return group_body

            group_body = make_group_body(c_group)

            arrs = [lo_t, j1_t]
            if compact_cols:
                # Column compaction: a column (one rhs atom) whose LANE
                # pairs are all invalid contributes nothing, yet its MXU
                # dot is the tile's dominant cost. Compact active
                # columns to the front via a one-hot permutation matmul
                # (all permuted values < 256, exact in bf16 — enforced
                # by the wrapper) and walk only ceil(n_act / c_group)
                # column groups: converts the tile-granularity cull
                # dilation (r + 2 * rad)^3 / r^3 into the column-
                # granularity (r + rad)^3 / r^3. Empty permutation
                # columns yield 0, so the j-arrays (where 0 is a real
                # row) are re-masked to the trash row beyond n_act;
                # garbage lo values only move counts within trash.
                act = jnp.max(valid.astype(jnp.int32), axis=0,
                              keepdims=True)  # (1, F)
                ps = act  # inclusive lane prefix sum by log2 F rolls
                lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
                s = 1
                while s < F:
                    ps = ps + jnp.where(lane1 >= s,
                                        pltpu.roll(ps, s, 1), 0)
                    s *= 2
                n_act = jnp.sum(act)  # scalar trip-count source
                dst_t = (ps - 1).reshape(1, F).T  # (F, 1)
                act_t = act.reshape(1, F).T
                iota_ff = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
                perm = ((iota_ff == dst_t) & (act_t > 0)).astype(
                    jnp.bfloat16)

                def _permute(a):
                    return jax.lax.dot_general(
                        a.astype(jnp.bfloat16), perm,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)

                lane_mask = iota_lo < n_act
                arrs = [_permute(arrs[0])] + [
                    jnp.where(lane_mask, _permute(a), trash)
                    for a in arrs[1:]
                ]
                # main + tail walk: the c_group-wide ceil walk wasted up
                # to c_group - 1 full-cost dots per subtile on the
                # rounding (mean n_act per kept tile at 42k is ~54 of
                # 128, so ~mid-tens of wasted 128-cycle dots); run
                # floor(n_act / c_group) wide trips, then finish the
                # remainder in TAIL_GROUP-wide trips
                n_grp = n_act // jnp.int32(c_group)
                rem = n_act - n_grp * jnp.int32(c_group)
                n_tail = ((rem + jnp.int32(TAIL_GROUP - 1))
                          // jnp.int32(TAIL_GROUP)) if tail_on else None
                if not tail_on:
                    n_grp = (n_act + jnp.int32(c_group - 1)) // jnp.int32(
                        c_group)
            else:
                n_grp = F // c_group
                n_tail = None
            if ablate_level == 1:
                # profiling: consume the pre-walk arrays (so nothing
                # above is dead-code-eliminated) without running the
                # column dot loops; m_pad <= LANE always holds
                out_ref[...] = (out_ref[...]
                                + arrs[1][:m_pad, :].astype(jnp.float32))
                return w & (w - 1)
            if lane_split:
                # parity offsets applied tile-wide AFTER compaction
                # (values stay < 256 through the bf16 permute): odd
                # columns' lo targets move to lanes [lane_w, F), their
                # j rows to [s_blk, 2*s_blk) — trash rows included
                # (trash + s_blk is also junk)
                arrs = [arrs[0] + col_par * jnp.int32(lane_w)] + [
                    a + col_par * jnp.int32(s_blk) for a in arrs[1:]
                ]
            accs0 = tuple(
                jnp.zeros((m_pad, F), acc_dtype)
                for _ in range(c_group // pairs_per)
            )
            (arrs_after, accs) = jax.lax.fori_loop(
                0, n_grp, group_body, (tuple(arrs), accs0)
            )
            total = accs[0]
            for a in accs[1:]:
                total = total + a
            if n_tail is not None:
                tail_accs0 = tuple(
                    jnp.zeros((m_pad, F), acc_dtype)
                    for _ in range(TAIL_GROUP // pairs_per)
                )
                (_, tail_accs) = jax.lax.fori_loop(
                    0, n_tail, make_group_body(TAIL_GROUP),
                    (arrs_after, tail_accs0)
                )
                for a in tail_accs:
                    total = total + a
            out_ref[...] = out_ref[...] + total.astype(jnp.float32)
            return w & (w - 1)

        jax.lax.fori_loop(0, _popcount32(word), subtile, word)
        return carry_g

      jax.lax.fori_loop(0, (word != 0).astype(jnp.int32), _group, 0)

    if inline_groups is None:
        _scan_word(j, mask_ref[i, j])
    else:
        # column-group loop folded INTO the kernel: one grid program
        # per row chunk instead of n_chunks x n_groups programs — the
        # ~4.5 us fixed dispatch cost per program is paid once per
        # chunk (13k+ programs at 84k atoms otherwise). All-culled
        # words cost the same zero-trip gate they cost as separate
        # programs; colpack_ref is indexed by the traced jw on its
        # leading dim (the resident-ref pattern).
        def _loop(jw, c):
            _scan_word(jw, mask_ref[i, jw])
            return c

        jax.lax.fori_loop(0, inline_groups, _loop, 0)


def pair_hist_relations_pallas(
    pos_r,  # (n_pad_r, 3) row positions, any (e.g. Morton) padded order
    idx_r,  # (n_pad_r,) original indices, -1 = pad
    types_r,  # (n_pad_r,) 0-based type codes (value at pads ignored)
    pos_c,  # (n_pad_c, 3) columns (same arrays as rows in the self case)
    idx_c,
    types_c,
    relations,  # (R, 2) 0-based host ints (distinct (a, b) pairs)
    lengths,
    bin_size: float,
    n_bins: int,
    r_cut: float,
    exclude_self: bool,
    with_full: bool,
    triangle: bool = False,
    interpret: bool = False,
    counts_r=None,  # (n_types_r,) true atom counts (self-pair re-add)
    compact_cols: bool = True,
    row_tiles=None,
    dot_int8=None,  # None -> module REL_DOT_INT8
    pos_r_lo=None,  # (n_pad_r, 3) f32 position residuals -> exact bins
    pos_c_lo=None,  # (n_pad_c, 3) f32 (same array as rows in self case)
    lengths_lo=None,  # (3,) f32 box-length residuals (exact bins)
):
    """Relation-projected ordered-pair histogram on mixed-type tiles.

    Returns (full (n_bins,) or None, rels (R, n_bins)) float32 — exactly
    ``pairs.project_relations`` of the dense ordered-pair histogram.
    ``triangle`` requires rows == columns; each unordered pair is
    inserted ONCE into an unordered-relation (or remainder) block and
    the ordered outputs are reconstructed by exact integer scaling
    (see the block-layout comment above); r = 0 self pairs are re-added
    analytically afterwards (needs ``counts_r`` when
    exclude_self=False).

    ``row_tiles``: (n_chunks,) GLOBAL column-tile index of each row
    chunk; defaults to arange (the unsharded self case). Under row
    sharding pass each shard's slice positions in the all-gathered
    column order — the cyclic-half triangle rule then counts every
    unordered tile pair exactly once across shards (sum / psum the
    per-shard results). Sharded triangle requires exclude_self=True
    (the r = 0 self-pair re-add must happen exactly once globally).
    """
    relations = [(int(a), int(b)) for a, b in np.asarray(relations)]
    if len(set(relations)) != len(relations):
        raise ValueError("relations must be distinct (a, b) pairs")
    n_pad_r, n_pad_c = pos_r.shape[0], pos_c.shape[0]
    if n_pad_r % LANE or n_pad_c % F:
        raise ValueError("padded sizes must be LANE multiples")
    n_chunks = n_pad_r // LANE
    n_tiles = n_pad_c // F
    n_rel = len(relations)
    # triangle mode histograms UNORDERED relations: (a, b) and (b, a)
    # collapse to one kernel block (their ordered histograms are equal
    # by pair symmetry); rels are reconstructed from the blocks below
    if triangle:
        u_map, kernel_relations, rel_idx = {}, [], []
        for a_r, b_r in relations:
            key = (min(a_r, b_r), max(a_r, b_r))
            if key not in u_map:
                u_map[key] = len(kernel_relations)
                kernel_relations.append(key)
            rel_idx.append(u_map[key])
    else:
        kernel_relations, rel_idx = relations, list(range(n_rel))
    n_blk = len(kernel_relations)
    # G=2 lane-split pairing (REL_LANE_SPLIT): radix width drops to 64
    # so two columns share each dot's 128-row weight load; feasible iff
    # both parity blocks fit the 128-row lhs
    lane_split = bool(REL_LANE_SPLIT)
    s_blk = 0
    if lane_split:
        hb_s = -(-n_bins // (F // 2))
        s_blk = -(-((1 + n_blk) * hb_s + 1) // 8) * 8
        lane_split = 2 * s_blk <= F
    if lane_split:
        hb = hb_s
        m_pad = 2 * s_blk
    else:
        s_blk = 0
        hb = -(-n_bins // F)
        m_pad = -(-((1 + n_blk) * hb + 1) // 8) * 8
    sharded_rows = row_tiles is not None
    if triangle:
        if not sharded_rows and n_pad_r != n_pad_c:
            raise ValueError(
                "triangle mode requires rows == columns (full self case) "
                "or explicit row_tiles for a row shard")
        if sharded_rows and not exclude_self:
            raise ValueError(
                "sharded triangle requires exclude_self=True (the r=0 "
                "self-pair re-add must happen exactly once globally)")
    if row_tiles is None:
        row_tiles = jnp.arange(n_chunks, dtype=jnp.int32)
    row_tiles = jnp.asarray(row_tiles, jnp.int32)

    f32 = jnp.float32
    pos_r = pos_r.astype(f32)
    pos_c = pos_c.astype(f32)
    idx_r = jnp.asarray(idx_r, jnp.int32)
    idx_c = jnp.asarray(idx_c, jnp.int32)
    exact_bins = pos_r_lo is not None
    if exact_bins:
        if pos_c_lo is None or lengths_lo is None:
            raise ValueError(
                "exact bins need pos_c_lo and lengths_lo alongside "
                "pos_r_lo")
        pos_r_lo = pos_r_lo.astype(f32)
        pos_c_lo = pos_c_lo.astype(f32)
        len2 = jnp.stack([jnp.asarray(lengths, f32),
                          jnp.asarray(lengths_lo, f32)])  # (2, 3)
    else:
        len2 = jnp.asarray(lengths, f32).reshape(1, 3)
    lengths = jnp.asarray(lengths, f32)

    # pad to a KC_REL multiple; when the system spans several column
    # blocks, pad the GROUP count to a COL_GROUP_BLOCK multiple too, so
    # every block (tail included) has identical shapes and shares one
    # compiled kernel (pad groups are all-pad tiles the keep mask culls
    # to zero cost)
    groups0 = -(-n_tiles // KC_REL)
    if groups0 > COL_GROUP_BLOCK:
        groups0 = -(-groups0 // COL_GROUP_BLOCK) * COL_GROUP_BLOCK
    pad_tiles = groups0 * KC_REL - n_tiles
    pos_c3 = pos_c.reshape(n_tiles, F, 3)
    idx_c3 = idx_c.reshape(n_tiles, F)
    tyc = jnp.asarray(types_c, f32).reshape(n_tiles, F)
    pos_c3_lo = (pos_c_lo.reshape(n_tiles, F, 3) if exact_bins else None)
    if pad_tiles:
        pos_c3 = jnp.concatenate(
            [pos_c3, jnp.zeros((pad_tiles, F, 3), f32)])
        idx_c3 = jnp.concatenate(
            [idx_c3, jnp.full((pad_tiles, F), -1, jnp.int32)])
        tyc = jnp.concatenate([tyc, jnp.full((pad_tiles, F), -1.0, f32)])
        if exact_bins:
            pos_c3_lo = jnp.concatenate(
                [pos_c3_lo, jnp.zeros((pad_tiles, F, 3), f32)])
    n_tiles_p = n_tiles + pad_tiles
    n_groups = n_tiles_p // KC_REL

    # global KC word packing must match the triangle row/tile indexing
    mask_words = _cull_mask_words(
        pos_r.reshape(n_chunks, LANE, 3), idx_r.reshape(n_chunks, LANE),
        pos_c3, idx_c3, lengths, float(r_cut), triangle, kc=KC_REL,
        row_tiles=row_tiles)

    row_parts = [
        pos_r[:, 0].reshape(n_chunks, LANE),
        pos_r[:, 1].reshape(n_chunks, LANE),
        pos_r[:, 2].reshape(n_chunks, LANE),
    ]
    col_parts = [
        pos_c3[:, :, 0].reshape(n_groups, KC_REL * F),
        pos_c3[:, :, 1].reshape(n_groups, KC_REL * F),
        pos_c3[:, :, 2].reshape(n_groups, KC_REL * F),
    ]
    if exact_bins:
        row_parts += [pos_r_lo[:, a].reshape(n_chunks, LANE)
                      for a in range(3)]
        col_parts += [pos_c3_lo[:, :, a].reshape(n_groups, KC_REL * F)
                      for a in range(3)]
    row_parts += [
        idx_r.astype(f32).reshape(n_chunks, LANE),
        jnp.asarray(types_r, f32).reshape(n_chunks, LANE),
    ]
    col_parts += [
        idx_c3.astype(f32).reshape(n_groups, KC_REL * F),
        tyc.reshape(n_groups, KC_REL * F),
    ]
    n_pack = 8 if exact_bins else 5
    rowpack = jnp.stack(row_parts, axis=1)  # (n_chunks, n_pack, LANE)
    colpack = jnp.stack(col_parts, axis=1)  # (n_groups, n_pack, KC_REL*F)

    # compaction permutes the j/lo values through a bf16 matmul; bf16 is
    # integer-exact below 257, so auto-disable for huge relation sets
    compact_cols = bool(compact_cols) and (1 + n_blk) * hb < 256
    # independent-accumulator group size: C_GROUP_REL was swept at
    # m_pad = 24 (786 KiB of accumulators); scale it down as m_pad grows
    # with the relation count / bin count so scoped VMEM stays bounded
    c_group = C_GROUP_REL
    pairs_per = 2 if lane_split else 1
    while c_group > 8 and (c_group // pairs_per) * m_pad > 64 * 24:
        c_group //= 2
    kernel = functools.partial(
        _rel_kernel,
        relations=tuple(kernel_relations),
        hb=int(hb),
        m_pad=int(m_pad),
        bin_size=float(bin_size),
        n_bins=int(n_bins),
        r_cut=float(r_cut),
        exclude_self=bool(exclude_self),
        with_full=bool(with_full),
        triangle=bool(triangle),
        compact_cols=compact_cols,
        c_group=int(c_group),
        dot_int8=bool(REL_DOT_INT8 if dot_int8 is None else dot_int8),
        tail_walk=bool(REL_TAIL_WALK),
        lane_split=bool(lane_split),
        s_blk=int(s_blk),
        ablate_level=(int(REL_ABLATE_LEVEL) if REL_ABLATE_LEVEL
                      else (1 if REL_ABLATE_WALK else 0)),
        exact_bins=bool(exact_bins),
    )
    def _call(mask_b, rt_b, co_b, rowpack_b, colpack_b):
        ng = colpack_b.shape[0]
        if REL_FUSE_GROUPS:
            grid = (rowpack_b.shape[0],)
            idx_row = lambda i, *s: (i, 0, 0)  # noqa: E731
            idx_const = lambda i, *s: (0, 0, 0)  # noqa: E731
            idx_out = lambda i, *s: (0, 0)  # noqa: E731
            kern = functools.partial(kernel, inline_groups=int(ng))
        else:
            grid = (rowpack_b.shape[0], ng)
            idx_row = lambda i, j, *s: (i, 0, 0)  # noqa: E731
            idx_const = lambda i, j, *s: (0, 0, 0)  # noqa: E731
            idx_out = lambda i, j, *s: (0, 0)  # noqa: E731
            kern = kernel
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n_pack, LANE), idx_row,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ng, n_pack, KC_REL * F), idx_const,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, F), idx_out,
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m_pad, F), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(mask_b, rt_b, co_b, rowpack_b, colpack_b, len2)

    rb = _row_block(min(n_groups, COL_GROUP_BLOCK))
    out = None
    for cs in range(0, n_groups, COL_GROUP_BLOCK):
        ce = min(cs + COL_GROUP_BLOCK, n_groups)
        co_b = jnp.asarray([cs], jnp.int32)
        colpack_b = colpack[cs:ce]
        for s in range(0, n_chunks, rb):
            e = min(s + rb, n_chunks)
            rp = rowpack[s:e]
            if out is not None:
                # serialize the block calls: their INPUTS are mutually
                # independent, so without this dependency XLA schedules
                # several pallas_calls live at once and their scoped
                # VMEM stacks SUM (observed: 2x at 671k atoms -> OOM)
                out, rp = jax.lax.optimization_barrier((out, rp))
            r = _call(mask_words[s:e, cs:ce], row_tiles[s:e], co_b,
                      rp, colpack_b)
            out = r if out is None else out + r

    def block(blk):
        if lane_split:
            w = F // 2
            a = out[blk * hb:(blk + 1) * hb, :w]
            b2 = out[s_blk + blk * hb:s_blk + (blk + 1) * hb, w:]
            return (a + b2).reshape(hb * w)[:n_bins]
        return out[blk * hb:(blk + 1) * hb].reshape(hb * F)[:n_bins]

    # remainder-block assembly: block 0 holds only the pairs matching NO
    # relation, so the full histogram is the sum over all blocks. In
    # triangle mode the blocks are UNORDERED (one insert per unordered
    # pair): rels[r] = block * (2 if a==b else 1) — a != b relations
    # read the shared unordered block directly (each unordered pair
    # contributes exactly one (a, b)-ordered pair), a == b relations
    # double it — and full doubles the block sum. Integer counts in
    # f32, so the scaling is exact.
    if triangle:
        ublocks = [block(1 + u) for u in range(n_blk)]
        rels = jnp.stack([
            ublocks[rel_idx[r]]
            * (2.0 if relations[r][0] == relations[r][1] else 1.0)
            for r in range(n_rel)
        ]) if n_rel else jnp.zeros((0, n_bins), jnp.float32)
        if with_full:
            full = block(0)
            for ub in ublocks:
                full = full + ub
            full = full * 2.0
        else:
            full = None
    else:
        rels = jnp.stack([block(1 + r) for r in range(n_rel)]) \
            if n_rel else jnp.zeros((0, n_bins), jnp.float32)
        full = block(0) + rels.sum(axis=0) if with_full else None
    if triangle:
        if not exclude_self:
            # r = 0 ordered self pairs, dropped by the strictly-upper mask
            if counts_r is None:
                raise ValueError(
                    "counts_r required for triangle + exclude_self=False")
            counts_r = np.asarray(counts_r, np.float64)
            n_real = float(counts_r.sum())
            if full is not None:
                full = full.at[0].add(jnp.float32(n_real))
            adds = np.zeros(n_rel, np.float32)
            for r, (a_r, b_r) in enumerate(relations):
                if a_r == b_r:
                    adds[r] = counts_r[a_r]
            rels = rels.at[:, 0].add(jnp.asarray(adds))
    return full, rels


# ---------------------------------------------------------------------------
# Relation-count kernel (coordination numbers): exact per-relation cutoffs
# ---------------------------------------------------------------------------
# CN needs only #{ordered pairs: type_p = a_r, type_q = b_r,
# rsq < r_cut_r^2} per relation — no histogram, so no per-column one-hot
# walk at all: each 128x128 tile is a handful of masked reductions on
# the VPU (~100x cheaper per tile than the histogram kernel, which the
# XLA pair_count_within path effectively paid anyway). Reference
# semantics: exact rsq < r_cut^2 cutoff (rdf_cn.py:100-119), NOT binned.

def _cn_kernel(
    mask_ref,  # (n_chunks, n_groups) i32 keep bits (scalar prefetch)
    row_tiles_ref,  # (n_chunks,) i32 GLOBAL tile index per row chunk
    col_off_ref,  # (1,) i32 GLOBAL group offset of this column block
    rows_ref,  # (1, 5, LANE) f32: x/y/z/idxf/typef
    colpack_ref,  # (n_groups, 5, KC_REL * F) f32, VMEM-resident
    len_ref,  # (1, 3) f32 (SMEM)
    out_ref,  # (r_pad, F) f32 persistent: per-relation per-lane partials
    *,
    relations,  # static tuple of 0-based (a, b)
    r_cuts_sq,  # static tuple of per-relation squared cutoffs
    exclude_self,
    triangle,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    word = mask_ref[i, j]

    def _group(_g, carry_g):
        lx = len_ref[0, 0]
        ly = len_ref[0, 1]
        lz = len_ref[0, 2]
        xr = rows_ref[0, 0, :].reshape(1, LANE).T  # (LANE, 1)
        yr = rows_ref[0, 1, :].reshape(1, LANE).T
        zr = rows_ref[0, 2, :].reshape(1, LANE).T
        idxr = rows_ref[0, 3, :].reshape(1, LANE).T
        tyr = rows_ref[0, 4, :].reshape(1, LANE).T

        def wrap(d, L):
            half = L * jnp.float32(0.5)
            return jnp.where(d > half, d - L,
                             jnp.where(d < -half, d + L, d))

        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (LANE, F), 1)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (LANE, F), 0)

        def subtile(_t, w):  # runs once per SET bit of the keep word
            k = _ctz32(w)
            jj = (col_off_ref[0] + j) * KC_REL + k
            off = pl.multiple_of(k * F, F)
            xc = colpack_ref[j, 0, pl.ds(off, F)]  # (F,)
            yc = colpack_ref[j, 1, pl.ds(off, F)]
            zc = colpack_ref[j, 2, pl.ds(off, F)]
            idxc = colpack_ref[j, 3, pl.ds(off, F)]
            tyc = colpack_ref[j, 4, pl.ds(off, F)]

            dx = wrap(xr - xc[None, :], lx)  # (LANE, F)
            dy = wrap(yr - yc[None, :], ly)
            dz = wrap(zr - zc[None, :], lz)
            rsq = dx * dx + dy * dy + dz * dz
            valid = (idxr >= 0) & (idxc[None, :] >= 0)
            if triangle:
                # cyclic-half rule: jj == this chunk's GLOBAL tile index
                # is the diagonal tile
                valid &= (iota_lane > iota_sub) | (jj != row_tiles_ref[i])
            if exclude_self:
                valid &= idxr != idxc[None, :]
            for r, (a_r, b_r) in enumerate(relations):
                m = ((tyr == jnp.float32(a_r))
                     & (tyc[None, :] == jnp.float32(b_r)))
                if triangle:
                    # both orientations of each unordered pair
                    mm = ((tyr == jnp.float32(b_r))
                          & (tyc[None, :] == jnp.float32(a_r)))
                    cnt = (m.astype(jnp.float32)
                           + mm.astype(jnp.float32))
                else:
                    cnt = m.astype(jnp.float32)
                wgt = jnp.where(
                    valid & (rsq < jnp.float32(r_cuts_sq[r])),
                    cnt, 0.0)
                s = jnp.sum(wgt, axis=0, keepdims=True)  # (1, F)
                cur = out_ref[pl.ds(r, 1), :]
                out_ref[pl.ds(r, 1), :] = cur + s
            return w & (w - 1)

        jax.lax.fori_loop(0, _popcount32(word), subtile, word)
        return carry_g

    jax.lax.fori_loop(0, (word != 0).astype(jnp.int32), _group, 0)


def pair_count_relations_pallas(
    pos_r,  # (n_pad_r, 3) row positions, any (e.g. Hilbert) padded order
    idx_r,  # (n_pad_r,) original indices, -1 = pad
    types_r,  # (n_pad_r,) 0-based type codes
    pos_c,
    idx_c,
    types_c,
    relations,  # (R, 2) 0-based host ints
    r_cuts,  # (R,) per-relation cutoffs
    lengths,
    exclude_self: bool,
    triangle: bool = False,
    interpret: bool = False,
    counts_r=None,  # (n_types_r,) true counts (self-pair re-add)
):
    """Exact per-relation cutoff pair counts on mixed-type tiles
    (the coordination-number kernel): returns (R,) float32 ordered-pair
    counts, equal to ``pairs.pair_count_within``. ``triangle`` requires
    rows == columns and inserts both orientations per unordered pair
    in-kernel (no mirroring step); with exclude_self=False the r = 0
    self pairs are re-added analytically from ``counts_r``."""
    relations = [(int(a), int(b)) for a, b in np.asarray(relations)]
    r_cuts = [float(v) for v in np.asarray(r_cuts).reshape(-1)]
    n_pad_r, n_pad_c = pos_r.shape[0], pos_c.shape[0]
    if n_pad_r % LANE or n_pad_c % F:
        raise ValueError("padded sizes must be LANE multiples")
    n_chunks = n_pad_r // LANE
    n_tiles = n_pad_c // F
    n_rel = len(relations)
    r_pad = max(8, -(-n_rel // 8) * 8)
    if triangle and n_pad_r != n_pad_c:
        raise ValueError("triangle mode requires rows == columns")

    f32 = jnp.float32
    pos_r = pos_r.astype(f32)
    pos_c = pos_c.astype(f32)
    idx_r = jnp.asarray(idx_r, jnp.int32)
    idx_c = jnp.asarray(idx_c, jnp.int32)
    lengths = jnp.asarray(lengths, f32)

    # pad to a KC_REL multiple; when the system spans several column
    # blocks, pad the GROUP count to a COL_GROUP_BLOCK multiple too, so
    # every block (tail included) has identical shapes and shares one
    # compiled kernel (pad groups are all-pad tiles the keep mask culls
    # to zero cost)
    groups0 = -(-n_tiles // KC_REL)
    if groups0 > COL_GROUP_BLOCK:
        groups0 = -(-groups0 // COL_GROUP_BLOCK) * COL_GROUP_BLOCK
    pad_tiles = groups0 * KC_REL - n_tiles
    pos_c3 = pos_c.reshape(n_tiles, F, 3)
    idx_c3 = idx_c.reshape(n_tiles, F)
    tyc = jnp.asarray(types_c, f32).reshape(n_tiles, F)
    if pad_tiles:
        pos_c3 = jnp.concatenate(
            [pos_c3, jnp.zeros((pad_tiles, F, 3), f32)])
        idx_c3 = jnp.concatenate(
            [idx_c3, jnp.full((pad_tiles, F), -1, jnp.int32)])
        tyc = jnp.concatenate([tyc, jnp.full((pad_tiles, F), -1.0, f32)])
    n_tiles_p = n_tiles + pad_tiles
    n_groups = n_tiles_p // KC_REL

    mask_words = _cull_mask_words(
        pos_r.reshape(n_chunks, LANE, 3), idx_r.reshape(n_chunks, LANE),
        pos_c3, idx_c3, lengths, max(r_cuts), triangle, kc=KC_REL)

    rowpack = jnp.stack([
        pos_r[:, 0].reshape(n_chunks, LANE),
        pos_r[:, 1].reshape(n_chunks, LANE),
        pos_r[:, 2].reshape(n_chunks, LANE),
        idx_r.astype(f32).reshape(n_chunks, LANE),
        jnp.asarray(types_r, f32).reshape(n_chunks, LANE),
    ], axis=1)
    colpack = jnp.stack([
        pos_c3[:, :, 0].reshape(n_groups, KC_REL * F),
        pos_c3[:, :, 1].reshape(n_groups, KC_REL * F),
        pos_c3[:, :, 2].reshape(n_groups, KC_REL * F),
        idx_c3.astype(f32).reshape(n_groups, KC_REL * F),
        tyc.reshape(n_groups, KC_REL * F),
    ], axis=1)

    kernel = functools.partial(
        _cn_kernel,
        relations=tuple(relations),
        r_cuts_sq=tuple(v * v for v in r_cuts),
        exclude_self=bool(exclude_self),
        triangle=bool(triangle),
    )
    row_tiles = jnp.arange(n_chunks, dtype=jnp.int32)

    def _call(mask_b, rt_b, co_b, rowpack_b, colpack_b):
        ng = colpack_b.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(rowpack_b.shape[0], ng),
            in_specs=[
                pl.BlockSpec((1, 5, LANE), lambda i, j, *s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ng, 5, KC_REL * F),
                             lambda i, j, *s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((r_pad, F), lambda i, j, *s: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r_pad, F), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(mask_b, rt_b, co_b, rowpack_b, colpack_b,
          lengths.reshape(1, 3))

    rb = _row_block(min(n_groups, COL_GROUP_BLOCK))
    out = None
    for cs in range(0, n_groups, COL_GROUP_BLOCK):
        ce = min(cs + COL_GROUP_BLOCK, n_groups)
        co_b = jnp.asarray([cs], jnp.int32)
        colpack_b = colpack[cs:ce]
        for s in range(0, n_chunks, rb):
            e = min(s + rb, n_chunks)
            rp = rowpack[s:e]
            if out is not None:
                # serialize the block calls: their INPUTS are mutually
                # independent, so without this dependency XLA schedules
                # several pallas_calls live at once and their scoped
                # VMEM stacks SUM (observed: 2x at 671k atoms -> OOM)
                out, rp = jax.lax.optimization_barrier((out, rp))
            r = _call(mask_words[s:e, cs:ce], row_tiles[s:e], co_b,
                      rp, colpack_b)
            out = r if out is None else out + r
    counts = out[:n_rel].sum(axis=1)
    if triangle and not exclude_self:
        if counts_r is None:
            raise ValueError(
                "counts_r required for triangle + exclude_self=False")
        counts_r = np.asarray(counts_r, np.float64)
        adds = np.zeros(n_rel, np.float32)
        for r, (a_r, b_r) in enumerate(relations):
            if a_r == b_r and r_cuts[r] > 0:
                adds[r] = counts_r[a_r]
        counts = counts + jnp.asarray(adds)
    return counts
