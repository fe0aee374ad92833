"""
Fused Pallas TPU kernel for the ordered-pair distance histogram.

Why: the XLA path materializes the radix one-hot matrices (P x 128 per
frame, tens of GB at 50k atoms) through HBM, which dominates runtime.
This kernel fuses minimum-image pair math + binning + one-hot + MXU
accumulation inside VMEM: the only HBM traffic is positions in and the
(types x types x bins) histogram out.

Shape strategy (Mosaic-friendly, all 2-D):
- one grid program per 128-row chunk (single-typed by ``TypeLayout``;
  the chunk's type code arrives via scalar prefetch); the chunk's
  coordinates are transposed once to (LANE, 1) so PAIRS LIVE ON
  SUBLANES;
- column type blocks stream in 128-aligned tiles (fori_loop); the pair
  math and radix split are batched per tile; a lane roll walks the
  tile's columns in groups of ``C_GROUP``, each column one (LANE, 1)
  static slice whose radix one-hots are plain 2-D compares against lane
  iotas (oh_lo (LANE, 128), oh_hi (LANE, 8));
- each column is one small MXU dot oh_hi^T @ oh_lo -> (8, 128) f32 into
  C_GROUP INDEPENDENT accumulators (pipelined), reduced per type block
  into the persistent VMEM output at row ``ta * n_codes_c + tb``.

Mosaic lessons encoded here: no reshapes that change the lane dim, no
dynamic slicing of values, dynamic REF slices must be 128-aligned on
lanes, static unrolls allocate fresh stack VMEM per iteration (use
fori_loop), pltpu.roll shift must be non-negative.

Semantics identical to ``pairs.pair_hist_rows`` (fast/f32 path):
bin = trunc(sqrt(rsq)/bin_size), keep rsq < r_cut^2 and bin < n_bins,
pad slots and (optionally) self pairs excluded via original-index masks.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdproptools_tpu.ops.pairs import LANE, TypeLayout

F = 128  # radix-lo width == lane width
H_SUB = 8  # sublane-padded radix-hi size (supports n_bins <= 1024)
C_GROUP = 64  # independent column dots per fori iteration


def _kernel(
    # scalar prefetch
    chunk_codes_ref,  # (n_chunks,) i32
    # inputs
    rows_ref,  # (1, 3, LANE) f32: this chunk's x/y/z rows
    idxr_ref,  # (1, 1, LANE) i32
    cols_ref,  # (3, n_padded_c) f32: full column x/y/z
    idxc_ref,  # (1, n_padded_c) i32
    len_ref,  # (1, 3) f32 box lengths (SMEM)
    # output
    out_ref,  # (n_codes_r * n_codes_c, H_SUB * F) f32, persistent block
    *,
    col_blocks,  # static: tuple of (tb, start, size)
    n_codes_c,
    bin_size,
    n_bins,
    r_cut,
    exclude_self,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ta = chunk_codes_ref[i]
    lx = len_ref[0, 0]
    ly = len_ref[0, 1]
    lz = len_ref[0, 2]
    # rows to sublanes: (LANE, 1)
    xr = rows_ref[0, 0, :].reshape(1, LANE).T
    yr = rows_ref[0, 1, :].reshape(1, LANE).T
    zr = rows_ref[0, 2, :].reshape(1, LANE).T
    idxr = idxr_ref[0, 0, :].reshape(1, LANE).T
    rc2 = jnp.float32(r_cut * r_cut)
    inv_ddr = jnp.float32(1.0 / bin_size)

    def wrap(d, L):
        half = L * jnp.float32(0.5)
        return jnp.where(d > half, d - L, jnp.where(d < -half, d + L, d))

    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LANE, F), 1)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (LANE, H_SUB), 1)

    # conservative bounding sphere of this row chunk (torus metric):
    # min-imaged displacements relative to the first row atom; pad rows
    # excluded. For spatially-sorted layouts the radius is small and the
    # per-tile cull below skips most far tiles; for unsorted layouts the
    # radius is ~box-sized and the cull never fires (safe no-op).
    rvalid = (idxr >= 0).astype(jnp.float32)  # (LANE, 1)
    nvalid = jnp.maximum(jnp.sum(rvalid), 1.0)
    drx = wrap(xr - xr[0, 0], lx) * rvalid
    dry = wrap(yr - yr[0, 0], ly) * rvalid
    drz = wrap(zr - zr[0, 0], lz) * rvalid
    mx = jnp.sum(drx) / nvalid
    my = jnp.sum(dry) / nvalid
    mz = jnp.sum(drz) / nvalid
    cx = xr[0, 0] + mx
    cy = yr[0, 0] + my
    cz = zr[0, 0] + mz
    rad2 = jnp.max(
        ((drx - mx) ** 2 + (dry - my) ** 2 + (drz - mz) ** 2) * rvalid
    )
    cull_thresh = (jnp.sqrt(rc2) + jnp.sqrt(rad2)) ** 2

    def with_acc(acc_ref):
      for tb, start, size in col_blocks:
        n_tiles = size // F
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def tile_body(t, carry):
            # 128-aligned tile load (VMEM dynamic slices must be
            # lane-aligned), pair math batched over the whole tile
            off = pl.multiple_of(start + t * F, F)
            xc = cols_ref[0, pl.ds(off, F)]  # (F,)
            yc = cols_ref[1, pl.ds(off, F)]
            zc = cols_ref[2, pl.ds(off, F)]
            idxc = idxc_ref[0, pl.ds(off, F)]

            # tile cull: min torus distance from the tile's columns to the
            # row chunk's bounding-sphere center; skip the whole tile if
            # even the closest column is beyond r_cut + radius. pl.when
            # (not lax.cond: Mosaic predicates value-level cond, executing
            # both sides) so the skip is a real branch.
            dcx = wrap(xc - cx, lx)
            dcy = wrap(yc - cy, ly)
            dcz = wrap(zc - cz, lz)
            col_ok = jnp.where(idxc >= 0,
                               dcx * dcx + dcy * dcy + dcz * dcz,
                               jnp.float32(3.4e38))
            dmin2 = jnp.min(col_ok)

            @pl.when(dmin2 <= cull_thresh)
            def _heavy():
                dx = wrap(xr - xc[None, :], lx)  # (LANE, F)
                dy = wrap(yr - yc[None, :], ly)
                dz = wrap(zr - zc[None, :], lz)
                rsq = dx * dx + dy * dy + dz * dz
                b = (jnp.sqrt(rsq) * inv_ddr).astype(jnp.int32)
                valid = (rsq < rc2) & (b < n_bins)
                valid &= (idxr >= 0) & (idxc[None, :] >= 0)
                if exclude_self:
                    valid &= idxr != idxc[None, :]
                # radix split batched over the whole tile ((LANE, 1)-shaped
                # ops inside the column loop run at 1/128 lane efficiency,
                # so hoist everything hoistable); invalid pairs get
                # radix-hi H_SUB, which selects an all-zero one-hot row
                hi_t = jnp.where(valid, jax.lax.div(b, jnp.int32(F)), H_SUB)
                lo_t = b - jax.lax.div(b, jnp.int32(F)) * jnp.int32(F)

                # C_GROUP columns per fori iteration, one small MXU dot
                # each into C_GROUP INDEPENDENT accumulators (no dependency
                # chain, so the dots pipeline); a lane roll walks the tile.
                # fori_loop (not a full static unroll) so Mosaic reuses
                # scratch buffers.
                def group_body(g, carry):
                    hi_c, lo_c, accs = carry
                    new_accs = []
                    for j in range(C_GROUP):
                        oh_hi = (hi_c[:, j:j + 1] == iota_hi).astype(
                            jnp.bfloat16)
                        oh_lo = (lo_c[:, j:j + 1] == iota_lo).astype(
                            jnp.bfloat16)
                        new_accs.append(accs[j] + jax.lax.dot_general(
                            oh_hi,
                            oh_lo,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))  # (H_SUB, F)
                    return (
                        pltpu.roll(hi_c, F - C_GROUP, 1),
                        pltpu.roll(lo_c, F - C_GROUP, 1),
                        tuple(new_accs),
                    )

                accs0 = tuple(
                    jnp.zeros((H_SUB, F), jnp.float32)
                    for _ in range(C_GROUP)
                )
                _, _, accs = jax.lax.fori_loop(
                    0, F // C_GROUP, group_body, (hi_t, lo_t, accs0)
                )
                total = accs[0]
                for a in accs[1:]:
                    total = total + a
                acc_ref[...] = acc_ref[...] + total

            return carry

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)
        row = ta * n_codes_c + tb
        cur = out_ref[pl.ds(row, 1), :]
        out_ref[pl.ds(row, 1), :] = cur + acc_ref[...].reshape(
            1, H_SUB * F)

    pl.run_scoped(with_acc, pltpu.VMEM((H_SUB, F), jnp.float32))


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
):
    """Pallas implementation of ``pairs.pair_hist_rows`` (f32).

    Returns (n_codes_r, n_codes_c, n_bins) float32. ``interpret`` runs
    the kernel in the Pallas interpreter (CPU test path). ``idx_c``
    overrides the column permutation (per-frame spatially-sorted
    layouts); defaults to ``layout_c.perm``.
    """
    n_chunks = pos_r.shape[0]
    n_codes_c = layout_c.n_codes
    if n_bins > H_SUB * F:
        raise ValueError(f"n_bins {n_bins} > {H_SUB * F} unsupported")
    col_blocks = tuple(
        (tb, int(layout_c.block_start[tb]), int(layout_c.block_size[tb]))
        for tb in range(n_codes_c)
        if layout_c.block_size[tb] > 0
    )

    rows = jnp.transpose(pos_r.astype(jnp.float32), (0, 2, 1))  # (nc,3,LANE)
    cols = jnp.transpose(pos_c.astype(jnp.float32), (1, 0))  # (3, Npc)
    idxr = idx_r.astype(jnp.int32)[:, None, :]  # (nc, 1, LANE)
    if idx_c is None:
        idxc = jnp.asarray(layout_c.perm, jnp.int32)[None, :]
    else:
        idxc = jnp.asarray(idx_c, jnp.int32)[None, :]
    lengths = jnp.asarray(lengths, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _kernel,
        col_blocks=col_blocks,
        n_codes_c=n_codes_c,
        bin_size=float(bin_size),
        n_bins=int(n_bins),
        r_cut=float(r_cut),
        exclude_self=bool(exclude_self),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 3, LANE), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_codes_r * n_codes_c, H_SUB * F), lambda i, s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_codes_r * n_codes_c, H_SUB * F), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_codes.astype(jnp.int32), rows, idxr, cols, idxc, lengths)
    return out.reshape(n_codes_r, n_codes_c, H_SUB * F)[:, :, :n_bins]
