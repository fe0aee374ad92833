"""
Radial distribution functions and coordination numbers from LAMMPS dumps.

API-compatible with the reference module ``mdproptools/structural/rdf_cn.py``
(entry points ``calc_atomic_rdf:385``, ``calc_atomic_cn:533``,
``calc_molecular_rdf:654``, ``calc_molecular_cn:759``,
``calc_intermolecular_rdf:857`` — same argument names/defaults, same output
DataFrame labels and CSV artifacts), but the per-frame numba pair loops are
replaced by one jit-compiled ordered-pair histogram kernel
(``mdproptools_tpu.ops.pairs``) scanned over frames entirely on device,
and the pandas groupby-apply COM (``rdf_cn.py:218-241``) by a segment-sum
COM.

Streaming architecture: frames are shipped to the device in fixed-size
blocks; a ``lax.scan`` inside one compiled program computes each frame's
histogram, applies the reference's *per-frame* normalization in the
reference's exact operation order, and accumulates the running sum on
device. Only one small array returns to host per block (critical when
the TPU sits behind a high-latency tunnel).

Math preserved exactly (verified by the float64 oracle tests):
- bin = trunc(sqrt(rsq)/bin_size), pairs kept when rsq < r_cut^2
  (``rdf_cn.py:62-69``);
- full histogram counts 2 per unordered pair, partials count both
  orientations (``rdf_cn.py:85-96``) == ordered-pair counting;
- per-frame normalization then frame averaging (``rdf_cn.py:297-338,
  502-521``): g_full = counts / (N * rho * Vshell),
  g_ab = counts / (N_a * rho_b * Vshell);
- CN cutoff is exact (rsq < r_cut[rel]^2), not binned (``rdf_cn.py:112``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mdproptools_tpu.common.system import System, altered_atom_types
from mdproptools_tpu.io.lammps_dump import (
    Trajectory,
    iter_trajectory_blocks,
    read_trajectory,
)
from mdproptools_tpu.ops import com as com_ops
from mdproptools_tpu.ops import pairs as pair_ops
from mdproptools_tpu.ops.precision import resolve_dtype
from mdproptools_tpu.utilities.device import note_upload
from mdproptools_tpu.utilities.tracing import stage

CON_CONSTANT = 1.660538921  # g/mol/A^3 -> g/cm^3, as in rdf_cn.py:30

FRAME_BLOCK = 128  # frames per device program (one transfer, one fetch)


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------
def _load(filename, columns=("id", "type", "x", "y", "z")):
    return read_trajectory(filename, columns=list(columns))


def _open_stream(filename, columns=("id", "type", "x", "y", "z"),
                 skip_frames=0, max_frames=None):
    """Open a dump pattern as a bounded-memory block stream. Returns
    (first_block, blocks_fn) where blocks_fn() iterates ALL blocks
    including the first — the first block supplies frame-0 metadata
    (codes, counts, consistency checks, kernel-policy shapes).

    Every rdf_cn entry point dispatches to the device, so the
    one-per-process background tunnel warmup starts here — its
    ~140-175 s first-fetch latency then overlaps the parse/cache read
    instead of serializing in front of the first block's dispatch
    (utilities/device.py; no-op on cpu)."""
    from mdproptools_tpu.io.lammps_dump import prefetch_iter
    from mdproptools_tpu.utilities.device import warm_device

    warm_device()

    it = prefetch_iter(
        iter_trajectory_blocks(filename, columns=list(columns),
                               block_frames=FRAME_BLOCK,
                               skip_frames=skip_frames,
                               max_frames=max_frames),
        depth=2,  # next block parses while the device runs this one
    )
    try:
        first = next(it)
    except StopIteration:
        raise ValueError(f"no frames parsed from {filename!r}")

    def blocks():
        yield first
        yield from it

    return first, blocks


def _atom_codes(traj: Trajectory, num_types, num_mols, num_atoms_per_mol):
    """1-based per-atom codes: LAMMPS types, or recalculated per-molecule
    ids when num_mols/num_atoms_per_mol are given (``rdf_cn.py:462-470``).
    Also runs the reference's consistency checks (``rdf_cn.py:266-279``)."""
    types = traj.data[0, :, traj.columns.index("type")].astype(np.int64)
    if num_mols and num_atoms_per_mol:
        ids = traj.data[0, :, traj.columns.index("id")].astype(np.int64)
        codes = altered_atom_types(ids, num_mols, num_atoms_per_mol)
        n_codes = int(sum(num_atoms_per_mol))
        observed = len(np.unique(codes))
        if observed != n_codes:
            raise ValueError(
                "Consistency check failed: Number of specified atomic types is "
                f"different from the calculated value specified= "
                f"{num_atoms_per_mol}, calculated= {observed}"
            )
    else:
        codes = types
        n_codes = int(num_types)
        observed = len(np.unique(types))
        if num_types != observed:
            raise ValueError(
                "Consistency check failed: Number of specified atomic types is "
                f"different from the calculated value specified= {num_types}, "
                f"calculated= {observed}"
            )
    return codes, n_codes, types


def _check_relations(relation_matrix, code_counts, n_codes, volumes, kind):
    """Range + zero-density guards (``rdf_cn.py:290-293``)."""
    for a, b in relation_matrix:
        if not (1 <= int(a) <= n_codes and 1 <= int(b) <= len(code_counts)):
            raise ValueError(
                f"partial relation ({a}, {b}) references a type outside "
                f"1..{n_codes} ({kind})"
            )
    for _, b in relation_matrix:
        if code_counts[int(b) - 1] / volumes.max() < 1.0e-22:
            raise ValueError("Error: Density is zero for mol type: " + str(b))


def _total_density(code_counts, mass, num_types, volume):
    """Per-frame total mass density in g/cm^3 — the reference's
    ``_calc_props`` diagnostic (``rdf_cn.py:281-286``):
    ``total_mass = sum_i mass[i] * count(code i+1)`` for i in
    ``range(num_types)``, ``density = total_mass / V * CON_CONSTANT``.
    Quirk reproduced: with recalculated per-molecule ids the reference
    indexes the FIRST ``num_types`` altered-id codes with the
    per-LAMMPS-type masses (its ``atom_types`` dict counts the id
    column there, ``rdf_cn.py:263,281``)."""
    mass = np.asarray(mass, np.float64).reshape(-1)
    if mass.size < num_types:
        raise ValueError(
            f"mass must list one value per atom type: got {mass.size} "
            f"masses for num_types={num_types}")
    counts = np.asarray(code_counts, np.float64)[:num_types]
    if counts.size < num_types or np.any(counts == 0):
        # the reference dies with a KeyError on the missing count
        # (``rdf_cn.py:281``); diverge to a clear ValueError
        raise ValueError(
            f"density diagnostic: no atoms with a code in 1..{num_types}"
            " (atom types must be numbered contiguously from 1)")
    total_mass = float((mass[:num_types] * counts).sum())
    return total_mass / volume * CON_CONSTANT


def _density_reporter(code_counts, mass, num_types):
    """Returns ``report(lengths_b)`` logging each frame's total density
    exactly as the reference prints it per frame (``rdf_cn.py:283-286``,
    logger instead of print). The mass-consistency ValueError raises
    eagerly (at entry-point call time) even when the logger is silent;
    the per-frame loop costs nothing when INFO is not enabled."""
    import logging

    from mdproptools_tpu.utilities.tracing import logger

    _total_density(code_counts, mass, num_types, 1.0)  # validate now

    def report(lengths_b):
        if not logger.isEnabledFor(logging.INFO):
            return
        for L in np.asarray(lengths_b, np.float64):
            dens = _total_density(code_counts, mass, num_types,
                                  float(np.prod(L)))
            logger.info("Average density=%10.8f", dens)

    return report


def _shell_volumes(bin_size, num_bins):
    k = np.arange(num_bins, dtype=np.float64)
    return 4.0 / 3.0 * np.pi * bin_size**3 * ((k + 1) ** 3 - k**3)


def _radii(bin_size, num_bins):
    return (np.arange(num_bins) + 0.5) * bin_size


def _save_rdf(radii, relation_matrix, path_or_buff, save_mode, rdf_part,
              rdf_full=None):
    """DataFrame/CSV writer with the reference's exact labels
    (``rdf_cn.py:341-365``)."""
    if rdf_full is not None:
        arrays = (radii, rdf_full) + tuple(rdf_part)
        labels = ["r ($\\AA$)", "g_full(r)"]
    else:
        arrays = (radii,) + tuple(rdf_part)
        labels = ["r ($\\AA$)"]
    labels += [f"g_{int(p[0])}-{int(p[1])}" for p in relation_matrix]
    df = pd.DataFrame(np.vstack(arrays).T, columns=labels)
    if save_mode:
        df.to_csv(path_or_buff, index=False)
    return df


def _save_cn(relation_matrix, path_or_buff, cn, save_mode):
    labels = [f"cn_{int(p[0])}-{int(p[1])}" for p in relation_matrix]
    df = pd.DataFrame(np.asarray(cn)[None, :], columns=labels)
    if save_mode:
        df.to_csv(path_or_buff, index=False)
    return df


# --------------------------------------------------------------------------
# device frame loop
# --------------------------------------------------------------------------
def _array_blocks(pos, lengths, pos_cols=None):
    """Slice already-materialized arrays into FRAME_BLOCK-sized blocks
    (the non-streaming path used by tests and small workloads)."""
    T = pos.shape[0]
    for s in range(0, T, FRAME_BLOCK):
        e = min(s + FRAME_BLOCK, T)
        yield (pos[s:e],
               None if pos_cols is None else pos_cols[s:e],
               lengths[s:e])


_trace_log: list = []  # appended at block-program trace time (test hook)

_FORCE_FRAMES_MESH = None  # test hook: force a mesh for _scan_frame_mean

# test hook: force the kernel-dispatch policy ("rel" | "type-block" |
# "auto" = enable the TPU dispatch logic without forcing a branch |
# None = production auto). On the CPU backend any non-None value also
# runs the Pallas kernels in interpreter mode, so the production
# dispatch branches (sorted sides, projection, normalization wiring,
# per-block policy switching) are testable without a TPU.
_FORCE_KERNEL = None

# Step/runner program cache: every `_rdf_mean`/`_cn_mean` call used to
# rebuild its step closure and block runner, so a SECOND call on the
# same system re-traced the block program and re-loaded the executable
# from the persistent compilation cache (~2-3 s through the axon
# tunnel) even though nothing changed. Entries key on every static that
# shapes the traced program (codes/counts/relations bytes, shapes,
# binning, policy inputs, backend, test hooks); positions/lengths stay
# traced arguments, so a cache hit can never change results.
_STEP_CACHE: "dict" = {}
_STEP_CACHE_MAX = 8


def _step_cache_get(key, build):
    entry = _STEP_CACHE.pop(key, None)  # pop+reinsert = LRU order
    if entry is None:
        entry = build()
        entry = (*entry, {})  # trailing dict: per-(shape, mesh) runners
        while len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
    _STEP_CACHE[key] = entry
    return entry


def _mesh_key(mesh):
    if mesh is None:
        return None
    return (mesh.axis_names, mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


_ACTIVE_MESH = None  # set via set_mesh(): user-pinned device mesh


def set_mesh(mesh):
    """Pin the device mesh every rdf_cn entry point runs on (product
    surface for pod slices). Accepts None (restore auto), a 1-axis
    ("frames",) mesh, or a 2-axis ("frames", "atoms") mesh — with an
    atoms axis, ``calc_atomic_rdf`` routes its large-N fast path through
    the row-sharded relation kernel (``parallel.sharded_rdf_relations``
    semantics) and every other path frame-shards over the flattened
    devices. Results are exact either way (integer pair counts;
    normalization is linear, so psum order cannot change them)."""
    global _ACTIVE_MESH
    if mesh is not None and tuple(mesh.axis_names) not in (
            ("frames",), ("frames", "atoms")):
        raise ValueError(
            "mesh axes must be ('frames',) or ('frames', 'atoms'), got "
            f"{mesh.axis_names}")
    _ACTIVE_MESH = mesh


def _auto_mesh(n_atoms=None, n_frames_hint=None):
    """The device mesh entry points run on: the pinned ``set_mesh``
    mesh, else (on a real multi-chip backend) an automatic mesh over all
    devices — frames-only data parallelism when the frame blocks can
    fill the slice, with the leftover devices moved to an ``atoms``
    (row-chunk) axis when frames are few and the system is large enough
    that each row shard keeps >= 32 LANE-chunks of work. On the CPU
    test backend this stays off so float64 oracle results keep their
    exact summation order (_FORCE_FRAMES_MESH / set_mesh override for
    the sharding tests)."""
    if _FORCE_FRAMES_MESH is not None:
        return _FORCE_FRAMES_MESH
    if _ACTIVE_MESH is not None:
        return _ACTIVE_MESH
    devs = jax.devices()
    if len(devs) <= 1 or jax.default_backend() in ("cpu",):
        return None
    from jax.sharding import Mesh

    D = len(devs)
    atoms_ax = 1
    if n_atoms is not None and n_frames_hint is not None:
        n_chunks = -(-int(n_atoms) // pair_ops.LANE)
        while (atoms_ax * 2 <= D and D % (atoms_ax * 2) == 0
               and n_chunks // (atoms_ax * 2) >= 32
               and n_frames_hint <= D // (atoms_ax * 2)):
            atoms_ax *= 2
    if atoms_ax == 1:
        return Mesh(np.asarray(devs), axis_names=("frames",))
    return Mesh(np.asarray(devs).reshape(D // atoms_ax, atoms_ax),
                axis_names=("frames", "atoms"))


def _frames_only(mesh):
    """Collapse any mesh to a 1-axis ("frames",) mesh over the same
    devices (the generic block runner shards frames only)."""
    if mesh is None or len(mesh.axis_names) == 1:
        return mesh
    from jax.sharding import Mesh

    return Mesh(mesh.devices.reshape(-1), axis_names=("frames",))


def _auto_frames_mesh():
    """Frames-only view of the active/auto mesh (used by the generic
    ``_scan_frame_mean`` path — CN, molecular RDF, etc.)."""
    return _frames_only(_auto_mesh())


def _make_block_runner(step_fn, out_shape, dtype, mesh=None,
                       with_perm=False):
    """One jitted frame-block program: scans
    ``step_fn(pos, pos_cols, L)`` over the block (weighted per frame, so
    sharding pads carry zero weight) and returns the block's summed
    rows. Reused across trajectories by the sweep layer (compiled once
    per block shape).

    ``mesh``: optional 1-axis ("frames",) device mesh — each device
    scans its frame shard and the partial sums psum over ICI, making
    every entry point frame-data-parallel across chips with no kernel
    changes (the reference's process-pool axis, SURVEY section 2.3).

    ``with_perm``: the runner takes a fifth (B, n_pad) int32 operand of
    host-computed spatial permutations, scanned alongside the frames and
    passed to ``step_fn(p, pc, L, pm)`` (the rel-kernel path's
    host-ORB-sort fast path — see ``pair_ops.host_sort_orb``)."""
    acc_dtype = jnp.float32 if dtype == jnp.float32 else dtype

    def scan_frames(pos_b, pos_cols_b, lengths_b, w_b, perm_b=None):
        _trace_log.append(out_shape)

        def step(acc, xs):
            if with_perm:
                p, pc, L, w, pm = xs
                rows = step_fn(p, pc, L, pm)
            else:
                p, pc, L, w = xs
                rows = step_fn(p, pc, L)
            return acc + w * rows.astype(acc.dtype), None

        acc0 = jnp.zeros(out_shape, acc_dtype)
        acc0 = acc0 + (pos_b[0, 0, 0] * 0).astype(acc_dtype)
        xs = (pos_b, pos_cols_b, lengths_b, w_b)
        if with_perm:
            xs = xs + (perm_b,)
        acc, _ = jax.lax.scan(step, acc0, xs)
        return acc

    if mesh is None:
        return jax.jit(scan_frames)

    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    from mdproptools_tpu.parallel.mesh import shard_map

    n_in = 5 if with_perm else 4

    @jax.jit
    @_partial(shard_map, mesh=mesh,
              in_specs=(P("frames"),) * n_in,
              out_specs=P(), check_vma=False)
    def run_block(pos_b, pos_cols_b, lengths_b, w_b, perm_b=None):
        return jax.lax.psum(
            scan_frames(pos_b, pos_cols_b, lengths_b, w_b, perm_b),
            "frames")

    return run_block


def _pad_rows(arr, extra):
    """One-allocation pad: copy ``arr`` into a fresh buffer with
    ``extra`` trailing copies of row 0 (``np.concatenate``+``np.repeat``
    would allocate an intermediate per input). The fresh buffer still
    pays this host's ~100x first-touch page-fault cost once, but only
    once per trajectory (the trailing partial block), not per block."""
    out = np.empty((arr.shape[0] + extra,) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    out[arr.shape[0]:] = arr[:1]
    return out


def _pad_block(pos_b, pc_b, len_b, n_pad_to, perm_b=None, target=0):
    """Pad a frame block to a multiple of the frames-mesh size with
    zero-weight copies of the first frame (equal shards requirement).

    ``target``: additionally pad up to this frame count — the streaming
    loops pass the steady block shape so a trailing partial block reuses
    the already-compiled program instead of triggering a fresh-shape
    compile (measured 74.7 s through the axon tunnel for the 2-frame
    remainder of the 10,100-frame north-star run vs <=1 block of masked
    compute, ~10 s, for the pad)."""
    nb = pos_b.shape[0]
    w = np.ones(nb)
    tgt = max(nb, int(target))
    if n_pad_to > 1 and tgt % n_pad_to:
        tgt += n_pad_to - tgt % n_pad_to
    if tgt > nb:
        extra = tgt - nb
        pos_b = _pad_rows(pos_b, extra)
        if pc_b is not None:
            pc_b = _pad_rows(pc_b, extra)
        len_b = _pad_rows(len_b, extra)
        if perm_b is not None:
            perm_b = _pad_rows(perm_b, extra)
        w = np.concatenate([w, np.zeros(extra)])
    return pos_b, pc_b, len_b, w, perm_b


def _accumulate_stream_device(run_block, blocks, dtype, n_pad_to=1):
    """Stream host blocks through ``run_block`` and return the running
    SUM plus the frame count. A trajectory that fits ONE frame block
    returns the UNFETCHED device array — the sweep fast path, letting
    many trajectories' results batch into a single synchronizing
    transfer (each fetch through the axon tunnel costs ~0.25 s
    regardless of size). Longer trajectories accumulate block sums into
    a HOST float64 total exactly like ``_run_stream`` — bit-identical
    cross-block precision to the entry points, and the per-block fetch
    bounds in-flight device buffers regardless of trajectory length."""
    total_host = None
    pending = None
    T = 0
    steady = 0
    for pos_b, pc_b, len_b in blocks:
        with stage("frame_block", start=T, frames=pos_b.shape[0]):
            nb = pos_b.shape[0]
            pos_b, pc_b, len_b, w, _ = _pad_block(pos_b, pc_b, len_b,
                                                  n_pad_to, target=steady)
            steady = max(steady, pos_b.shape[0])
            pb = jnp.asarray(pos_b, dtype)
            pcb = pb if pc_b is None else jnp.asarray(pc_b, dtype)
            cur = run_block(pb, pcb, jnp.asarray(len_b, dtype),
                            jnp.asarray(w, dtype))
            if pending is not None:
                fetched = np.asarray(pending, np.float64)
                total_host = fetched if total_host is None \
                    else total_host + fetched
            pending = cur
            T += nb
    if T == 0:
        raise ValueError("no frames to average")
    if total_host is None:
        return pending, T  # single block: still on device, unfetched
    return total_host + np.asarray(pending, np.float64), T


def _run_stream(run_block, out_shape, blocks, dtype, n_pad_to=1):
    """Stream (pos_b, pos_cols_b|None, lengths_b) host blocks through a
    block runner; returns the frame mean (running sum fetched once per
    block, divided by the streamed frame count on host — the reference's
    accumulate-then-divide order, ``rdf_cn.py:514-521``).

    Double-buffered: jax dispatch is asynchronous, so block k+1 is
    parsed, transferred and dispatched while the device still runs
    block k; the (synchronizing) host fetch of block k happens last."""
    total = np.zeros(out_shape, np.float64)
    T = 0
    pending = None  # device result of the previous block, not yet fetched
    steady = 0
    for pos_b, pc_b, len_b in blocks:
        with stage("frame_block", start=T, frames=pos_b.shape[0]):
            nb = pos_b.shape[0]
            pos_b, pc_b, len_b, w, _ = _pad_block(pos_b, pc_b, len_b,
                                                  n_pad_to, target=steady)
            steady = max(steady, pos_b.shape[0])
            pb = jnp.asarray(pos_b, dtype)
            pcb = pb if pc_b is None else jnp.asarray(pc_b, dtype)
            note_upload(int(pb.nbytes)
                        + (0 if pc_b is None else int(pcb.nbytes)))
            cur = run_block(pb, pcb, jnp.asarray(len_b, dtype),
                            jnp.asarray(w, dtype))
            if pending is not None:
                total += np.asarray(pending, np.float64)
            pending = cur
            T += nb
    if pending is not None:
        total += np.asarray(pending, np.float64)
    if T == 0:
        raise ValueError("no frames to average")
    return total / T


def _scan_frame_mean(step_fn, out_shape, blocks, dtype, runners=None):
    """Mean over frames of ``step_fn(pos_t, pos_cols_t, L_t)`` computed as
    an on-device running sum (``lax.scan`` over frame blocks from the
    ``blocks`` iterator of (pos_b, pos_cols_b|None, lengths_b) host
    arrays). Host/device memory stays O(block), independent of
    trajectory length. jit compiles exactly ONE program per stream: a
    trailing partial block pads (zero-weight) up to the steady block
    shape and reuses the compiled program (see ``_pad_block``).

    ``runners``: optional dict tied to the step's _STEP_CACHE entry;
    block runners are memoized there so repeat entry-point calls on the
    same system reuse the jitted program instead of re-tracing."""
    mesh = _auto_frames_mesh()
    rkey = (tuple(out_shape), jnp.dtype(dtype).name, _mesh_key(mesh))
    run_block = None if runners is None else runners.get(rkey)
    if run_block is None:
        run_block = _make_block_runner(step_fn, out_shape, dtype, mesh=mesh)
        if runners is not None:
            runners[rkey] = run_block
    return _run_stream(run_block, out_shape, blocks, dtype,
                       n_pad_to=1 if mesh is None else mesh.size)


def _rdf_policy(n_atoms, v_min, r_cut, spatial_sort, use_pallas,
                distinct_rels):
    """Kernel-dispatch policy for a given box volume: returns
    (use_rel, sort_on, kept_est).

    Estimated kept tile-pair fraction under a global balanced-ORB sort:
    128-atom ORB box tiles measure ~0.88 * (LANE/rho)^(1/3) in median
    radius with a tight tail (max ~1.1x median; Hilbert curve tiles ran
    ~1.15x in the median with a ~1.8x tail, and one fat tile keeps every
    tile pair touching it).

    The relation-projected mixed-tile kernel's compact ORB tiles feed
    three exact work-skippers the type-block kernel can't match
    (minority-species type blocks are box-sized): the tile cull skips
    (1 - kept) of tile pairs, culled subtiles are free (popcount-trip
    walk), and in-kernel column compaction skips the all-invalid
    columns inside kept tiles. Since the remainder-block + unordered-
    relation encoding (one one-hot insert per unordered pair) its
    per-pair cost also matches the type-block insert. Measured on v5e
    at 400 bins + 4 partials, rel vs type-block ms/frame: 10.5k atoms
    45.3 vs 46.1 (kept_est 2.25); 21k 100.4 vs 163.9 (1.12); 42k
    200.6 vs 291.7 (0.56); 84k 418.9 vs 684.2 (0.33) — rel wins at
    every measured size, so the engage threshold only fences the
    UNMEASURED small-dense regime (tiny boxes where the cull keeps
    everything and tile padding dominates).

    Evaluated PER FRAME BLOCK (NPT boxes drift): `_rdf_mean` regroups
    blocks by the (use_rel, sort_on) decision so the dispatch follows
    the density instead of staying pinned to frame 0's volume.
    """
    rho = max(n_atoms / v_min, 1e-30)
    rad = 0.88 * (pair_ops.LANE / rho) ** (1.0 / 3.0)
    kept_est = 4.0 / 3.0 * np.pi * (r_cut + 2.0 * rad) ** 3 / v_min
    if spatial_sort == "auto":
        # per-type-block sort for the type-block kernel only where its
        # (weak) cull can pay; the rel path sorts unconditionally (its
        # engage threshold below is the real decision)
        sort_on = use_pallas and kept_est < 0.85
        rel_sort_ok = use_pallas
    else:
        sort_on = rel_sort_ok = bool(spatial_sort)
    use_rel = (use_pallas and distinct_rels and rel_sort_ok
               and kept_est < 2.5)
    if _FORCE_KERNEL == "rel":  # test hook: drive the rel branch on CPU
        use_rel = use_pallas and distinct_rels
    elif _FORCE_KERNEL == "type-block":
        use_rel = False
    return bool(use_rel), bool(sort_on), float(kept_est)


def _make_normalizer(relation_matrix, code_counts_rows, code_counts_cols,
                     n_rows_total, with_full, shell):
    """Reference-exact per-frame normalization (rho_b = count_b / V
    first, then counts / (N_a * rho_b * Vshell), ``rdf_cn.py:288-329``)
    shared by the single-device step and the row-sharded runner (it is
    linear in the counts, so normalize-then-psum == psum-then-
    normalize)."""

    def normalize(full, rels, L):
        sdtype = rels.dtype
        shell_d = jnp.asarray(shell, sdtype)
        V = L[0] * L[1] * L[2]
        rows = []
        if with_full:
            rho = n_rows_total / V
            rows.append(full.astype(sdtype)
                        / (n_rows_total * rho * shell_d))
        for r, (a, b) in enumerate(relation_matrix):
            n_a = float(code_counts_rows[int(a) - 1])
            cnt_b = float(code_counts_cols[int(b) - 1])
            rho_b = cnt_b / V
            rows.append(rels[r].astype(sdtype) / (n_a * rho_b * shell_d))
        return jnp.stack(rows)

    return normalize


def _make_host_normalizer(relation_matrix, code_counts_rows,
                          code_counts_cols, n_rows_total, with_full,
                          shell):
    """float64 host twin of ``_make_normalizer`` for the exact-bins
    path: expression-for-expression identical (same operand order), so
    normalizing the kernel's exact integer counts here is bit-equal to
    strict mode's on-device f64 normalization."""

    def normalize(rows_counts, L):
        # rows_counts: (nrows, n_bins) float64 integer counts; L: (3,)
        V = L[0] * L[1] * L[2]
        out = np.empty_like(rows_counts)
        base = 0
        if with_full:
            rho = n_rows_total / V
            out[0] = rows_counts[0] / (n_rows_total * rho * shell)
            base = 1
        for r, (a, b) in enumerate(relation_matrix):
            n_a = float(code_counts_rows[int(a) - 1])
            cnt_b = float(code_counts_cols[int(b) - 1])
            rho_b = cnt_b / V
            out[base + r] = rows_counts[base + r] / (n_a * rho_b * shell)
        return out

    return normalize


def _make_exact_block_runner(step_fn):
    """jitted frame-block program for the exact-bins path: scans
    ``step_fn(p_hi, p_lo, L_hi, L_lo, pm)`` over the block and returns
    the PER-FRAME raw count rows (B, nrows, n_bins) — normalization and
    frame averaging happen on host in float64 (zero-weight pad frames
    are dropped there). Single-device only; the mesh paths keep the f32
    pipeline."""

    def scan_frames(ph_b, pl_b, lh_b, ll_b, perm_b):
        _trace_log.append("exact")

        def body(carry, xs):
            ph, plo, lh, ll, pm = xs
            return carry, step_fn(ph, plo, lh, ll, pm)

        _, ys = jax.lax.scan(body, 0, (ph_b, pl_b, lh_b, ll_b, perm_b))
        return ys

    return jax.jit(scan_frames)


def _make_rdf_step(
    codes, n_codes, n_atoms_rows, lengths, bin_size, n_bins, r_cut,
    relation_matrix, code_counts_rows, code_counts_cols, exclude_self,
    with_full, dtype, n_atoms_cols=None, codes_cols=None,
    n_codes_cols=None, spatial_sort="auto", policy=None,
    external_perm=False, exact_bins=False,
):
    """Build the per-frame RDF step function once (layouts, kernel and
    sort policy, normalization constants) so the sweep layer can reuse
    ONE compiled block program across many same-system trajectories.
    Returns (step, nrows) where step(pos, pos_cols, lengths) -> the
    normalized per-frame rows and nrows = R + (1 if with_full).

    ``exact_bins`` (rel-kernel self case with ``external_perm`` only):
    the step becomes ``step(p_hi, p_lo, L_hi, L_lo, pm)`` -> RAW
    per-frame count rows (nrows, n_bins): positions arrive split into
    (hi, lo) f32 pairs and the kernel bins every pair in double-f32
    arithmetic (``ops.dfloat``), bit-equal to the float64 reference
    loop; normalization then happens on host in float64
    (``_make_host_normalizer``), making fast mode's g(r) IDENTICAL to
    strict mode's.

    ``external_perm`` (rel-kernel self case only): the step takes a
    fourth (n_pad,) int32 argument — a host-computed spatial
    permutation (``pair_ops.host_sort_orb``) — instead of running the
    device ORB sort per frame. Exact either way; the device sort's
    ~log2(n_tiles) sequential ``lax.sort`` rounds cost ~29 ms of the
    42k-atom frame on v5e (benchmarks/profile_42k.json) while the host
    twin overlaps with device compute in the streamed pipeline.

    Per-frame normalization uses the reference's exact operation order:
    rho_b = count_b / V first, then counts / (N_a * rho_b * Vshell)
    (``rdf_cn.py:288-329``).

    Fast-path structure for the self (atom-atom / COM-COM) case on TPU:
    per frame, an on-device spatial sort makes 128-atom tiles spatially
    compact (so the Pallas kernel's tile cull skips far tile pairs), and
    triangle mode computes each off-diagonal tile pair once, mirroring by
    hist[ta, tb] == hist[tb, ta]. Both are exact-count-preserving — the
    results are bit-identical to the dense unsorted path.
    """
    self_case = n_atoms_cols is None
    layout_r = pair_ops.build_type_layout(codes, n_codes)
    layout_c = (
        layout_r
        if self_case
        else pair_ops.build_type_layout(codes_cols, n_codes_cols)
    )
    shell = _shell_volumes(bin_size, n_bins)
    n_rows_total = int(code_counts_rows.sum())

    on_tpu = jax.default_backend() not in ("cpu",)
    interpret = _FORCE_KERNEL is not None and not on_tpu
    use_pallas = ((on_tpu or interpret)
                  and dtype == jnp.float32 and n_bins <= 1024)
    method = ("pallas" if use_pallas
              else "onehot" if on_tpu and dtype == jnp.float32
              else "scatter")
    triangle = use_pallas and self_case
    distinct_rels = (len({(int(a), int(b)) for a, b in relation_matrix})
                     == relation_matrix.shape[0])
    if policy is None:
        policy = _rdf_policy(
            int(code_counts_rows.sum()),
            float(np.prod(lengths, axis=1).min()), r_cut, spatial_sort,
            use_pallas, distinct_rels,
        )[:2]
    use_rel, sort_on = policy
    ncell = pair_ops.pick_ncell(n_rows_total)
    n_pad_r = -(-n_atoms_rows // pair_ops.LANE) * pair_ops.LANE
    codes0_r = jnp.asarray(np.asarray(codes) - 1, jnp.float32)
    if not self_case:
        n_pad_c = -(-n_atoms_cols // pair_ops.LANE) * pair_ops.LANE
        codes0_c = jnp.asarray(np.asarray(codes_cols) - 1, jnp.float32)
    relations0 = np.asarray(relation_matrix, np.int64) - 1

    if external_perm and not (use_rel and self_case):
        raise ValueError(
            "external_perm is only meaningful for the rel-kernel self "
            "case (one sorted side)")
    if exact_bins:
        if not (external_perm and use_rel and self_case and use_pallas):
            raise ValueError(
                "exact_bins requires the host-perm rel-kernel self case")
        from mdproptools_tpu.ops.pairs_pallas import (
            pair_hist_relations_pallas,
        )

        def step_exact(p_hi, p_lo, L_h, L_l, pm):
            pr = pair_ops.gather_padded_perm(p_hi, pm)
            prl = pair_ops.gather_padded_perm(p_lo, pm)
            ty = jnp.where(pm >= 0, codes0_r[jnp.maximum(pm, 0)], -1.0)
            full, rels = pair_hist_relations_pallas(
                pr, pm, ty, pr, pm, ty, relations0, L_h, bin_size,
                n_bins, r_cut, exclude_self=exclude_self,
                with_full=with_full, triangle=triangle,
                counts_r=code_counts_rows, interpret=interpret,
                pos_r_lo=prl, pos_c_lo=prl, lengths_lo=L_l,
            )
            return rels if full is None \
                else jnp.concatenate([full[None], rels])

        nrows = relation_matrix.shape[0] + (1 if with_full else 0)
        return step_exact, nrows

    def step(p, pc, L, pm_ext=None):
        sdtype = p.dtype
        if use_rel:
            if pm_ext is not None:
                pm = pm_ext
                pr = pair_ops.gather_padded_perm(
                    p.astype(jnp.float32), pm)
                ty = jnp.where(pm >= 0,
                               codes0_r[jnp.maximum(pm, 0)], -1.0)
            else:
                pr, pm, ty = pair_ops.orb_sorted_side(
                    p.astype(jnp.float32), p.shape[0], n_pad_r, L,
                    codes0_r)
            if self_case:
                pc3, pmc, tyc = pr, pm, ty
            else:
                pc3, pmc, tyc = pair_ops.orb_sorted_side(
                    pc.astype(jnp.float32), pc.shape[0], n_pad_c, L,
                    codes0_c)
            from mdproptools_tpu.ops.pairs_pallas import (
                pair_hist_relations_pallas,
            )
            full, rels = pair_hist_relations_pallas(
                pr, pm, ty, pc3, pmc, tyc, relations0, L, bin_size,
                n_bins, r_cut, exclude_self=exclude_self,
                with_full=with_full, triangle=triangle,
                counts_r=code_counts_rows, interpret=interpret,
            )
        elif self_case:
            pm = (pair_ops.device_sort_perm(p, layout_r, L, ncell)
                  if sort_on else jnp.asarray(layout_r.perm, jnp.int32))
            pr = pair_ops.gather_padded_perm(p, pm).astype(sdtype)
            nc = layout_r.n_padded // pair_ops.LANE
            hist = pair_ops.pair_hist_rows(
                pr.reshape(nc, pair_ops.LANE, 3),
                pm.reshape(nc, pair_ops.LANE),
                jnp.asarray(layout_r.chunk_codes),
                pr, layout_r, n_codes_r=layout_r.n_codes, lengths=L,
                bin_size=bin_size, n_bins=n_bins, r_cut=r_cut,
                exclude_self=exclude_self, dtype=sdtype, idx_c=pm,
                method=method, triangle=triangle, interpret=interpret,
                # compaction only pays when tiles are spatially compact
                # (the within-type-block sort); exact either way
                compact_cols=sort_on,
            ).astype(sdtype)
            full, rels = pair_ops.project_relations(
                hist, relation_matrix, with_full)
        else:
            pr = pair_ops.gather_padded(p, layout_r)
            pcc = pair_ops.gather_padded(pc, layout_c)
            hist = pair_ops.pair_hist(
                pr, pcc, layout_r, layout_c, L, bin_size, n_bins, r_cut,
                exclude_self, dtype=sdtype, method=method,
                interpret=interpret,
            ).astype(sdtype)
            full, rels = pair_ops.project_relations(
                hist, relation_matrix, with_full)
        return normalize(full, rels, L).astype(sdtype)

    normalize = _make_normalizer(relation_matrix, code_counts_rows,
                                 code_counts_cols, n_rows_total, with_full,
                                 shell)
    nrows = relation_matrix.shape[0] + (1 if with_full else 0)
    return step, nrows


_policy_log: list = []  # (use_rel, sort_on, kept_est) per block (test hook)


def _make_rdf_mean_stream(
    pos, codes, n_codes, lengths, bin_size, n_bins, r_cut, relation_matrix,
    code_counts_rows, code_counts_cols, exclude_self, with_full, dtype,
    pos_cols=None, codes_cols=None, n_codes_cols=None, spatial_sort="auto",
    exact_bins="auto",
):
    """Configure a ``_RdfMeanStream`` (policy closure + cached runners)
    for a system whose shapes/codes come from ``pos``/first block —
    everything `_rdf_mean` does except consuming the blocks.

    The kernel-dispatch policy (``_rdf_policy``) is re-evaluated from
    each BLOCK's minimum box volume, so an NPT trajectory whose box
    drifts re-selects the kernel instead of keeping frame 0's decision;
    step programs are cached per policy, so a drifting box traces each
    engaged kernel once. When the active mesh has an ``atoms`` axis and
    the block policy selects the relation kernel (self case), the block
    runs through the frame+row-sharded runner
    (``parallel.mesh.make_sharded_relations_runner``).

    ``exact_bins``: "auto" (default) upgrades the fast-mode (f32)
    single-device rel-kernel self path to double-f32 exact binning +
    float64 host normalization (``ops.dfloat``; bit-equal to strict
    mode at near-fast cost); True forces it (raising where
    unsupported); False keeps the plain f32 pipeline (the documented
    ~1e-4 bin-edge envelope). Mesh-sharded, molecular/cross and
    type-block-policy paths keep f32 regardless of "auto".
    """
    self_case = pos_cols is None
    on_tpu = jax.default_backend() not in ("cpu",)
    interpret = _FORCE_KERNEL is not None and not on_tpu
    use_pallas = ((on_tpu or interpret)
                  and dtype == jnp.float32 and n_bins <= 1024)
    distinct_rels = (len({(int(a), int(b)) for a, b in relation_matrix})
                     == relation_matrix.shape[0])
    n_atoms_pol = int(code_counts_rows.sum())
    nrows_out = relation_matrix.shape[0] + (1 if with_full else 0)
    out_shape = (nrows_out, n_bins)
    mesh = _auto_mesh(pos.shape[1], pos.shape[0])
    mesh_2d = (mesh is not None and len(mesh.axis_names) == 2
               and mesh.devices.shape[1] > 1)

    base_key = (
        "rdf", np.asarray(codes).tobytes(), int(n_codes),
        int(pos.shape[1]),
        float(bin_size), int(n_bins), float(r_cut),
        np.asarray(relation_matrix).tobytes(),
        np.asarray(code_counts_rows).tobytes(),
        np.asarray(code_counts_cols).tobytes(),
        bool(exclude_self), bool(with_full), jnp.dtype(dtype).name,
        None if pos_cols is None else int(pos_cols.shape[1]),
        None if codes_cols is None else np.asarray(codes_cols).tobytes(),
        n_codes_cols, str(spatial_sort), _FORCE_KERNEL,
        jax.default_backend(),
    )

    def perm_fn_for():
        n_at = int(pos.shape[1])
        n_pad_r = -(-n_at // pair_ops.LANE) * pair_ops.LANE

        def perm_fn(pos_b):
            pos_b = np.asarray(pos_b)
            return np.stack([
                pair_ops.host_sort_orb(pos_b[t], n_at, n_pad_r)
                for t in range(pos_b.shape[0])])

        return perm_fn

    def runner_for(pol):
        """(run_block, n_pad_to, perm_fn, exact_norm) for a policy,
        memoized via _STEP_CACHE. ``perm_fn`` (host-ORB fast path) maps
        a host (B, N, 3) position block to (B, n_pad) int32
        permutations the runner scans alongside the frames; None when
        the policy's step sorts on device (sharded runner, non-rel
        kernels). ``exact_norm`` is the float64 host normalizer of the
        exact-bins path (the runner then returns per-frame raw counts);
        None selects the standard normalized-on-device pipeline."""
        use_rel = pol[0]
        sharded_rel = (mesh_2d and use_rel and self_case and exclude_self
                       and use_pallas)
        host_perm = use_rel and self_case and not sharded_rel
        use_exact = (exact_bins is not False and host_perm and use_pallas
                     and dtype == jnp.float32
                     and _frames_only(mesh) is None)
        if exact_bins is True and not use_exact:
            raise ValueError(
                "exact_bins=True requires the fast-mode single-device "
                "rel-kernel self path (TPU/interpret, f32, no mesh, "
                "policy selecting the relation kernel)")
        step, nrows, runners = _step_cache_get(
            base_key + pol + (host_perm, use_exact),
            lambda: _make_rdf_step(
                codes, n_codes, pos.shape[1], lengths, bin_size, n_bins,
                r_cut, relation_matrix, code_counts_rows, code_counts_cols,
                exclude_self, with_full, dtype,
                n_atoms_cols=None if pos_cols is None else pos_cols.shape[1],
                codes_cols=codes_cols, n_codes_cols=n_codes_cols,
                spatial_sort=spatial_sort, policy=pol,
                external_perm=host_perm, exact_bins=use_exact,
            ),
        )
        if use_exact:
            rkey = ("exact", out_shape)
            run = runners.get(rkey)
            if run is None:
                run = _make_exact_block_runner(step)
                runners[rkey] = run
            exact_norm = _make_host_normalizer(
                relation_matrix, code_counts_rows, code_counts_cols,
                n_atoms_pol, with_full, _shell_volumes(bin_size, n_bins))
            return run, 1, perm_fn_for(), exact_norm
        if sharded_rel:
            rkey = ("rel-sharded", out_shape, jnp.dtype(dtype).name,
                    _mesh_key(mesh))
            run = runners.get(rkey)
            if run is None:
                from mdproptools_tpu.parallel.mesh import (
                    make_sharded_relations_runner,
                )

                normalize = _make_normalizer(
                    relation_matrix, code_counts_rows, code_counts_cols,
                    n_atoms_pol, with_full, _shell_volumes(bin_size, n_bins))
                inner = make_sharded_relations_runner(
                    np.asarray(codes) - 1,
                    np.asarray(relation_matrix, np.int64) - 1,
                    pos.shape[1], bin_size, n_bins, r_cut, mesh,
                    with_full, normalize, interpret=interpret)

                def run(pb, pcb, len_b, w_b):
                    return inner(pb, len_b, w_b)

                runners[rkey] = run
            return run, mesh.devices.shape[0], None, None
        fmesh = _frames_only(mesh)
        rkey = ("frames", out_shape, jnp.dtype(dtype).name,
                _mesh_key(fmesh))
        run = runners.get(rkey)
        if run is None:
            run = _make_block_runner(step, out_shape, dtype, mesh=fmesh,
                                     with_perm=host_perm)
            runners[rkey] = run
        perm_fn = perm_fn_for() if host_perm else None
        return run, 1 if fmesh is None else fmesh.size, perm_fn, None

    return _RdfMeanStream(
        out_shape, dtype, runner_for,
        lambda v_min_b: _rdf_policy(n_atoms_pol, v_min_b, r_cut,
                                    spatial_sort, use_pallas,
                                    distinct_rels),
        with_full,
    )


def _rdf_mean(
    pos, codes, n_codes, lengths, bin_size, n_bins, r_cut, relation_matrix,
    code_counts_rows, code_counts_cols, exclude_self, with_full, dtype,
    pos_cols=None, codes_cols=None, n_codes_cols=None, spatial_sort="auto",
    blocks=None, exact_bins="auto", return_sum=False,
):
    """Frame-averaged normalized RDF: returns (g_full or None, g_part).

    ``blocks``: optional iterator of (pos_b, pos_cols_b|None, lengths_b)
    host blocks for streaming ingestion (``pos``/``lengths`` then only
    inform shapes — pass the first block). When None,
    ``pos``/``pos_cols``/``lengths`` are full arrays. See
    ``_make_rdf_mean_stream`` for the policy/runner structure and
    ``_make_rdf_step`` for the per-frame math.

    ``return_sum``: return the raw (total (nrows, n_bins) float64 SUM of
    per-frame normalized rows, frame count) instead of the mean — the
    mergeable partial for the capped-RSS segmented runner
    (``parallel.segmented``)."""
    stream = _make_rdf_mean_stream(
        pos, codes, n_codes, lengths, bin_size, n_bins, r_cut,
        relation_matrix, code_counts_rows, code_counts_cols, exclude_self,
        with_full, dtype, pos_cols=pos_cols, codes_cols=codes_cols,
        n_codes_cols=n_codes_cols, spatial_sort=spatial_sort,
        exact_bins=exact_bins,
    )
    if blocks is None:
        blocks = _array_blocks(pos, lengths, pos_cols)
    for pos_b, pc_b, len_b in blocks:
        stream.fold(pos_b, pc_b, len_b)
    if return_sum:
        stream._flush()
        return stream.total, stream.T
    return stream.result()


class _RdfMeanStream:
    """Push-model RDF frame-mean accumulator: ``fold`` one host block at
    a time (per-block kernel-policy re-evaluation, double-buffered
    device dispatch), ``result()`` for the frame mean. Built by
    ``_rdf_mean`` (the pull wrapper) and by the shared-parse composite
    pipeline (``mdproptools_tpu.pipeline``), which folds the SAME parsed
    block into several property streams."""

    def __init__(self, out_shape, dtype, runner_for, policy_for,
                 with_full):
        self.out_shape = out_shape
        self.dtype = dtype
        self._runner_for = runner_for
        self._policy_for = policy_for
        self.with_full = with_full
        self.total = np.zeros(out_shape, np.float64)
        self.T = 0
        self._pending = None
        self._cur_pol = None
        self._run_block = None
        self._n_pad_to = 1
        self._perm_fn = None
        self._exact_norm = None  # f64 host normalizer (exact-bins path)
        self._steady = 0  # steady block shape; partial blocks pad to it

    def fold(self, pos_b, pc_b, len_b):
        v_min_b = float(np.prod(np.asarray(len_b), axis=1).min())
        use_rel, sort_on, kept_est = self._policy_for(v_min_b)
        pol = (use_rel, sort_on)
        _policy_log.append((use_rel, sort_on, kept_est))
        if pol != self._cur_pol:
            if self._cur_pol is not None:
                from mdproptools_tpu.utilities.tracing import logger

                logger.info(
                    "rdf kernel policy switched at frame %d: %s -> %s "
                    "(box volume drift; kept_est=%.2f)",
                    self.T, self._cur_pol, pol, kept_est)
            (self._run_block, self._n_pad_to, self._perm_fn,
             self._exact_norm) = self._runner_for(pol)
            self._cur_pol = pol
            # the steady shape belongs to the runner: the new runner
            # has no compiled programs yet, so pad to ITS natural
            # multiple instead of carrying the old runner's shape over
            self._steady = 0
        with stage("frame_block", start=self.T, frames=pos_b.shape[0]):
            nb = pos_b.shape[0]
            perm_b = None if self._perm_fn is None else self._perm_fn(pos_b)
            pos_b, pc_b, len_b, w, perm_b = _pad_block(
                pos_b, pc_b, len_b, self._n_pad_to, perm_b,
                target=self._steady)
            self._steady = max(self._steady, pos_b.shape[0])
            if self._exact_norm is not None:
                # exact-bins path: ship (hi, lo) split positions and box
                # lengths; the runner returns PER-FRAME raw counts which
                # the f64 host normalizer folds when this block's fetch
                # comes due (double buffering preserved)
                pos64 = np.asarray(pos_b, np.float64)
                len64 = np.array(len_b, np.float64)
                ph = pos64.astype(np.float32)
                plo = (pos64 - ph).astype(np.float32)
                lh = len64.astype(np.float32)
                llo = (len64 - lh).astype(np.float32)
                note_upload(ph.nbytes + plo.nbytes
                            + np.asarray(perm_b).nbytes)
                cur = self._run_block(
                    jnp.asarray(ph), jnp.asarray(plo), jnp.asarray(lh),
                    jnp.asarray(llo), jnp.asarray(perm_b))
                self._flush()
                self._pending = ("exact", cur, len64, w,
                                 self._exact_norm)
                self.T += nb
                return
            pb = jnp.asarray(pos_b, self.dtype)
            pcb = pb if pc_b is None else jnp.asarray(pc_b, self.dtype)
            args = (pb, pcb, jnp.asarray(len_b, self.dtype),
                    jnp.asarray(w, self.dtype))
            if perm_b is not None:
                args += (jnp.asarray(perm_b),)
            note_upload(int(pb.nbytes)
                        + (0 if pc_b is None else int(pcb.nbytes))
                        + (0 if perm_b is None else int(perm_b.nbytes)))
            cur = self._run_block(*args)
            self._flush()
            self._pending = ("sum", cur)
            self.T += nb

    def _flush(self):
        if self._pending is None:
            return
        if self._pending[0] == "sum":
            self.total += np.asarray(self._pending[1], np.float64)
        else:
            _, cur, len64, w, norm = self._pending
            ys = np.asarray(cur, np.float64)  # (B, nrows, n_bins) counts
            for t in range(ys.shape[0]):
                if w[t] > 0:
                    self.total += norm(ys[t], len64[t])
        self._pending = None

    def result(self):
        self._flush()
        if self.T == 0:
            raise ValueError("no frames to average")
        out = self.total / self.T
        if self.with_full:
            return out[0], out[1:]
        return None, out


def _cn_mean(
    pos, codes, n_codes, lengths, relation_matrix, r_cuts, code_counts_rows,
    exclude_self, dtype,
    pos_cols=None, codes_cols=None, n_codes_cols=None, blocks=None,
):
    """Frame-averaged coordination numbers (R,), normalized per frame by
    the reference-type count (``rdf_cn.py:332-338``)."""
    def build():
        layout_r = pair_ops.build_type_layout(codes, n_codes)
        layout_c = (
            layout_r
            if pos_cols is None
            else pair_ops.build_type_layout(codes_cols, n_codes_cols)
        )
        n_ref = np.array(
            [code_counts_rows[int(a) - 1] for a in relation_matrix[:, 0]],
            np.float64,
        )
        self_case = pos_cols is None
        # TPU fast path: ORB-sorted mixed tiles + the relation-count
        # Pallas kernel (exact per-relation cutoffs, triangle for the
        # self case, tile cull) — ~100x the dense XLA compare-sum;
        # strict/CPU keeps the float64 pair_count_within oracle path.
        on_tpu = jax.default_backend() not in ("cpu",)
        interpret = _FORCE_KERNEL is not None and not on_tpu
        use_cn_kernel = (on_tpu or interpret) and dtype == jnp.float32
        n_pad_r = -(-pos.shape[1] // pair_ops.LANE) * pair_ops.LANE
        codes0_r = jnp.asarray(np.asarray(codes) - 1, jnp.float32)
        if not self_case:
            n_pad_c = (-(-pos_cols.shape[1] // pair_ops.LANE)
                       * pair_ops.LANE)
            codes0_c = jnp.asarray(
                np.asarray(codes_cols) - 1, jnp.float32)
        relations0 = np.asarray(relation_matrix, np.int64) - 1

        def step(p, pc, L):
            sdtype = p.dtype
            if use_cn_kernel:
                from mdproptools_tpu.ops.pairs_pallas import (
                    pair_count_relations_pallas,
                )
                pr, pm, ty = pair_ops.orb_sorted_side(
                    p.astype(jnp.float32), p.shape[0], n_pad_r, L,
                    codes0_r)
                if self_case:
                    pc3, pmc, tyc = pr, pm, ty
                else:
                    pc3, pmc, tyc = pair_ops.orb_sorted_side(
                        pc.astype(jnp.float32), pc.shape[0], n_pad_c, L,
                        codes0_c)
                counts = pair_count_relations_pallas(
                    pr, pm, ty, pc3, pmc, tyc, relations0, r_cuts, L,
                    exclude_self, triangle=self_case,
                    counts_r=code_counts_rows, interpret=interpret,
                )
            else:
                pr = pair_ops.gather_padded(p, layout_r)
                pcc = (pr if pos_cols is None
                       else pair_ops.gather_padded(pc, layout_c))
                counts = pair_ops.pair_count_within(
                    pr, pcc, layout_r, layout_c, L, relation_matrix,
                    r_cuts, exclude_self, dtype=sdtype,
                )
            return counts.astype(sdtype) / jnp.asarray(n_ref, sdtype)

        return (step,)

    key = (
        "cn", np.asarray(codes).tobytes(), int(n_codes),
        int(pos.shape[1]),
        np.asarray(relation_matrix).tobytes(),
        np.asarray(r_cuts, np.float64).tobytes(),
        np.asarray(code_counts_rows).tobytes(),
        bool(exclude_self), jnp.dtype(dtype).name,
        None if pos_cols is None else int(pos_cols.shape[1]),
        None if codes_cols is None else np.asarray(codes_cols).tobytes(),
        n_codes_cols, _FORCE_KERNEL, jax.default_backend(),
    )
    step, runners = _step_cache_get(key, build)
    if blocks is None:
        blocks = _array_blocks(pos, lengths, pos_cols)
    return _scan_frame_mean(step, (relation_matrix.shape[0],), blocks,
                            dtype, runners=runners)


_segment_com_jit = jax.jit(com_ops.segment_com, static_argnums=(3,))


def _mol_coms(traj: Trajectory, system: System, mass, dtype):
    """Per-frame molecular centers of mass from *wrapped* x,y,z — the
    reference's convention in ``_define_mol_cols`` (``rdf_cn.py:218-241``).
    Returns (T, M, 3) numpy float64 and 1-based mol-type codes (M,)."""
    types = traj.data[0, :, traj.columns.index("type")].astype(np.int64)
    masses = np.asarray(mass, np.float64)[types - 1]
    pos = traj.cols(["x", "y", "z"])
    # jitted (cached on shapes): the eager form dispatched ~10 ops per
    # block through the device tunnel
    out = _segment_com_jit(
        jnp.asarray(pos, dtype),
        jnp.asarray(masses, dtype),
        jnp.asarray(system.mol_index),
        system.n_molecules,
    )
    return np.asarray(out, np.float64), system.mol_type_of_molecule


# --------------------------------------------------------------------------
# entry points (reference-parity APIs)
# --------------------------------------------------------------------------
def calc_atomic_rdf(
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    filename,
    num_mols=None,
    num_atoms_per_mol=None,
    path_or_buff="rdf.csv",
    save_mode=True,
    precision="fast",
    spatial_sort="auto",
    exact_bins="auto",
    skip_frames=0,
    max_frames=None,
    _return_sum=False,
):
    """Full and partial atom-atom RDF averaged over all frames matching
    ``filename`` (reference: ``rdf_cn.py:385-530``).

    ``skip_frames``/``max_frames`` select a frame window of the stream
    (cheap skip: cached blocks seek by index, text files wholly inside
    the skip are never parsed) — the restart/segmentation hooks used by
    the capped-RSS runner ``parallel.segmented`` (``_return_sum`` then
    returns the raw (sum-of-normalized-rows, frame count) partial
    instead of writing the averaged CSV).

    ``spatial_sort``: "auto" (default) re-orders atoms spatially per
    frame on device whenever the box is large enough relative to r_cut
    for the Pallas kernel's tile cull to skip far tile pairs (the
    O(N^2) -> O(N * n_near) lever for large systems); True/False force
    it. Results are bit-identical either way (integer counts, order-
    independent).

    ``exact_bins``: "auto" (default) upgrades the fast-mode TPU rel-
    kernel path to double-f32 exact binning + float64 host
    normalization (``ops.dfloat``) — ``precision="fast"`` then returns
    the SAME g(r) as ``precision="strict"`` (bit-equal, each pair
    binned exactly as the reference's float64 loop) at near-fast cost.
    False keeps the plain f32 pipeline (the documented ~1e-4 bin-edge
    envelope); True forces exact and raises where unsupported (the
    mesh-sharded and type-block-policy paths stay f32 under "auto").

    Ingestion is streamed in FRAME_BLOCK-frame blocks (host memory
    O(block x N), any trajectory length); the density consistency check
    uses the first block's volumes."""
    dtype = resolve_dtype(precision)
    first, blocks = _open_stream(filename, skip_frames=skip_frames,
                                 max_frames=max_frames)
    codes, n_codes, _ = _atom_codes(first, num_types, num_mols,
                                    num_atoms_per_mol)
    num_bins = int(r_cut / bin_size)
    relation_matrix = np.asarray(partial_relations).T  # (R, 2)
    lengths = first.box_lengths
    volumes = lengths.prod(axis=1)
    code_counts = np.bincount(codes - 1, minlength=n_codes).astype(np.float64)
    _check_relations(relation_matrix, code_counts, n_codes, volumes, "atom")
    report_density = _density_reporter(code_counts, mass, num_types)

    def pos_blocks():
        for blk in blocks():
            report_density(blk.box_lengths)
            yield blk.cols(["x", "y", "z"]), None, blk.box_lengths

    out = _rdf_mean(
        first.cols(["x", "y", "z"]), codes, n_codes, lengths, bin_size,
        num_bins, float(r_cut), relation_matrix, code_counts, code_counts,
        exclude_self=True, with_full=True, dtype=dtype,
        spatial_sort=spatial_sort, blocks=pos_blocks(),
        exact_bins=exact_bins, return_sum=_return_sum,
    )
    if _return_sum:
        return out  # (total (1+R, n_bins) float64, frame count)
    rdf_full, rdf_part = out
    return _save_rdf(_radii(bin_size, num_bins), relation_matrix, path_or_buff,
                     save_mode, rdf_part, rdf_full)


def calc_atomic_cn(
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    filename,
    num_mols=None,
    num_atoms_per_mol=None,
    path_or_buff="cn.csv",
    save_mode=True,
    precision="fast",
):
    """Atom-atom coordination numbers, one exact cutoff per relation
    (reference: ``rdf_cn.py:533-651``). Streamed ingestion."""
    dtype = resolve_dtype(precision)
    first, blocks = _open_stream(filename)
    codes, n_codes, _ = _atom_codes(first, num_types, num_mols,
                                    num_atoms_per_mol)
    relation_matrix = np.asarray(partial_relations).T
    lengths = first.box_lengths
    code_counts = np.bincount(codes - 1, minlength=n_codes).astype(np.float64)
    _check_relations(relation_matrix, code_counts, n_codes,
                     lengths.prod(axis=1), "atom")
    report_density = _density_reporter(code_counts, mass, num_types)

    r_cuts = np.asarray(r_cut, np.float64).reshape(-1)
    if r_cuts.size == 1:
        r_cuts = np.full(relation_matrix.shape[0], float(r_cuts[0]))

    def pos_blocks():
        for blk in blocks():
            report_density(blk.box_lengths)
            yield blk.cols(["x", "y", "z"]), None, blk.box_lengths

    cn = _cn_mean(
        first.cols(["x", "y", "z"]), codes, n_codes, lengths,
        relation_matrix, r_cuts, code_counts,
        exclude_self=True, dtype=dtype, blocks=pos_blocks(),
    )
    return _save_cn(relation_matrix, path_or_buff, cn, save_mode)


def calc_molecular_rdf(
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    filename,
    num_mols,
    num_atoms_per_mol,
    path_or_buff="rdf_mol.csv",
    save_mode=True,
    precision="fast",
):
    """Partial RDF between an atom type and molecular centers of mass
    (reference: ``rdf_cn.py:654-756``; one-directional counting as in
    ``_rdf_mol_loop``, ``rdf_cn.py:122-141``). Streamed ingestion with
    per-block segment-sum COMs."""
    dtype = resolve_dtype(precision)
    first, blocks = _open_stream(filename)
    system = System(num_mols, num_atoms_per_mol, mass=mass)
    codes, n_codes, types = _atom_codes(first, num_types, None, None)
    num_bins = int(r_cut / bin_size)
    relation_matrix = np.asarray(partial_relations).T
    lengths = first.box_lengths
    volumes = lengths.prod(axis=1)
    atom_counts = np.bincount(types - 1, minlength=num_types).astype(np.float64)
    mol_pos0, mol_codes = _mol_coms(first, system, mass, dtype)
    mol_counts = np.bincount(mol_codes - 1,
                             minlength=system.n_mol_types).astype(np.float64)
    _check_relations(relation_matrix, mol_counts, n_codes, volumes, "molecule")
    # the reference's _calc_props here counts LAMMPS types (ref_df
    # keeps "type", rdf_cn.py:718-721)
    report_density = _density_reporter(atom_counts, mass, num_types)

    def pos_blocks():
        for i, blk in enumerate(blocks()):
            report_density(blk.box_lengths)
            mp = (mol_pos0 if i == 0
                  else _mol_coms(blk, system, mass, dtype)[0])
            yield blk.cols(["x", "y", "z"]), mp, blk.box_lengths

    _, rdf_part = _rdf_mean(
        first.cols(["x", "y", "z"]), codes, n_codes, lengths, bin_size,
        num_bins, float(r_cut), relation_matrix, atom_counts, mol_counts,
        exclude_self=False, with_full=False, dtype=dtype,
        pos_cols=mol_pos0, codes_cols=mol_codes,
        n_codes_cols=system.n_mol_types, blocks=pos_blocks(),
    )
    return _save_rdf(_radii(bin_size, num_bins), relation_matrix, path_or_buff,
                     save_mode, rdf_part)


def calc_molecular_cn(
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    filename,
    num_mols,
    num_atoms_per_mol,
    path_or_buff="cn_mol.csv",
    save_mode=True,
    precision="fast",
):
    """Coordination number between an atom type and molecular COMs
    (reference: ``rdf_cn.py:759-855``). Streamed ingestion."""
    dtype = resolve_dtype(precision)
    first, blocks = _open_stream(filename)
    system = System(num_mols, num_atoms_per_mol, mass=mass)
    codes, n_codes, types = _atom_codes(first, num_types, None, None)
    relation_matrix = np.asarray(partial_relations).T
    lengths = first.box_lengths
    atom_counts = np.bincount(types - 1, minlength=num_types).astype(np.float64)
    mol_pos0, mol_codes = _mol_coms(first, system, mass, dtype)
    report_density = _density_reporter(atom_counts, mass, num_types)

    r_cuts = np.asarray(r_cut, np.float64).reshape(-1)
    if r_cuts.size == 1:
        r_cuts = np.full(relation_matrix.shape[0], float(r_cuts[0]))

    def pos_blocks():
        for i, blk in enumerate(blocks()):
            report_density(blk.box_lengths)
            mp = (mol_pos0 if i == 0
                  else _mol_coms(blk, system, mass, dtype)[0])
            yield blk.cols(["x", "y", "z"]), mp, blk.box_lengths

    cn = _cn_mean(
        first.cols(["x", "y", "z"]), codes, n_codes, lengths,
        relation_matrix, r_cuts, atom_counts,
        exclude_self=False, dtype=dtype,
        pos_cols=mol_pos0, codes_cols=mol_codes,
        n_codes_cols=system.n_mol_types, blocks=pos_blocks(),
    )
    return _save_cn(relation_matrix, path_or_buff, cn, save_mode)


def calc_intermolecular_rdf(
    r_cut,
    bin_size,
    num_types,
    mass,
    partial_relations,
    filename,
    num_mols,
    num_atoms_per_mol,
    path_or_buff="rdf_mol.csv",
    save_mode=True,
    precision="fast",
):
    """COM-COM partial RDF (reference: ``rdf_cn.py:857-903``). Note: like
    the reference, self-pairs are *included* (its ``_rdf_mol_loop`` runs
    mol_data against itself without exclusion), so g(r->0) bins contain
    the self count. Streamed ingestion (per-block segment-sum COMs).

    Divergence: the per-frame density diagnostic the other entry points
    log is skipped here — the reference's ``_calc_props`` call at
    ``rdf_cn.py:877`` counts MOLECULE types but indexes them with
    ``range(num_types)`` (LAMMPS atom types), a KeyError whenever
    num_types exceeds the molecule-type count (the function is marked
    "TODO: recheck" in the reference)."""
    dtype = resolve_dtype(precision)
    first, blocks = _open_stream(filename)
    system = System(num_mols, num_atoms_per_mol, mass=mass)
    num_bins = int(r_cut / bin_size)
    relation_matrix = np.asarray(partial_relations).T
    lengths = first.box_lengths
    volumes = lengths.prod(axis=1)
    mol_pos0, mol_codes = _mol_coms(first, system, mass, dtype)
    mol_counts = np.bincount(mol_codes - 1,
                             minlength=system.n_mol_types).astype(np.float64)
    _check_relations(relation_matrix, mol_counts, system.n_mol_types, volumes,
                     "molecule")

    def pos_blocks():
        for i, blk in enumerate(blocks()):
            mp = (mol_pos0 if i == 0
                  else _mol_coms(blk, system, mass, dtype)[0])
            yield mp, None, blk.box_lengths

    _, rdf_part = _rdf_mean(
        mol_pos0, mol_codes, system.n_mol_types, lengths, bin_size, num_bins,
        float(r_cut), relation_matrix, mol_counts, mol_counts,
        exclude_self=False, with_full=False, dtype=dtype,
        blocks=pos_blocks(),
    )
    return _save_rdf(_radii(bin_size, num_bins), relation_matrix, path_or_buff,
                     save_mode, rdf_part)
