#!/usr/bin/env python
"""
Measured per-stage decomposition of the 42k-atom RDF frame (VERDICT r3
task #2: replace the inferred floor decomposition with measurements).

The 193 ms/frame steady state at 41,916 atoms (400 bins, 4 partials,
r_cut 20) was ATTRIBUTED to: MXU column-walk dots (107 ms walked-slot
bound), non-overlapped VPU one-hot build, ~4.5 us x n_programs of grid
dispatch, and the XLA-side per-frame ORB sort. This script measures the
split directly with stage ablations, all steady-state two-length deltas
(t(T_big) - t(T_small)) / (T_big - T_small) ending in a host fetch
(axon's block_until_ready does not block):

  full       production step: ORB sort + cull + Pallas kernel + normalize
  sort       orb_sorted_side alone (XLA: ~log2(n_tiles) segmented sorts)
  sort_cull  sort + bit-packed tile cull mask (XLA side)
  staleperm  gather with a FIXED frame-0 permutation + cull + kernel +
             normalize — the full step minus the per-frame sort; also
             the candidate optimization (a stale ORB permutation is
             legal: the keep mask is recomputed from current positions,
             so results stay exact — only cull efficiency drifts)
  prewalk    staleperm with REL_ABLATE_LEVEL=1: every kernel stage up
             to and including column compaction runs, the column dot
             walks are skipped -> isolates the MXU walk share
  valid      REL_ABLATE_LEVEL=2: stop after the pair-validity mask
             (pair math runs; relation build + compaction skipped)
  loads      REL_ABLATE_LEVEL=3: stop after the column VMEM loads
             (the per-subtile fixed cost: loop trip + ctz + reads)

Derived:  sort = full - staleperm (cross-check vs direct `sort`)
          mxu_walk = staleperm - prewalk
          relation build + compaction = prewalk - valid
          pair math = valid - loads
          fixed-per-subtile + XLA glue = loads

Writes ONE json: benchmarks/profile_42k.json.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402

_REF = os.environ.get("MDPT_DATA_DIR", "/root/reference/data/mg_tfsi_dme")
DATA_DIR = (_REF if os.path.isdir(_REF)
            else os.path.join(os.path.dirname(HERE), "data", "mg_tfsi_dme"))

R_CUT, BIN_SIZE, N_BINS = 20.0, 0.05, 400
RELATIONS = np.array([[8, 1], [8, 4], [8, 6], [8, 8]])  # 1-based
T_SMALL, T_BIG, REPEATS = 8, 40, 3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.ops import pairs as pair_ops
    from mdproptools_tpu.ops import pairs_pallas as pp
    from mdproptools_tpu.structural import rdf_cn

    traj = read_trajectory(os.path.join(DATA_DIR, "dump.nvt.0.dump"),
                           columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)  # 1-based
    L0 = traj.box_lengths[0]
    reps = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]
    pos50 = np.concatenate(
        [traj.cols(["x", "y", "z"])[0] + np.array(r) * L0 for r in reps]
    ).astype(np.float32)
    codes50 = np.tile(codes1, len(reps))
    len50 = np.array([L0[0] * 2, L0[1] * 2, L0[2]], np.float32)
    counts50 = np.bincount(codes50 - 1, minlength=9).astype(np.float64)

    n_atoms = pos50.shape[0]
    LANE = pair_ops.LANE
    n_pad = -(-n_atoms // LANE) * LANE
    n_chunks = n_pad // LANE
    codes0 = jnp.asarray(codes50 - 1, jnp.float32)
    relations0 = RELATIONS.astype(np.int64) - 1
    F = pp.F

    # column-side tile padding exactly as pair_hist_relations_pallas
    groups0 = -(-n_chunks // pp.KC_REL)
    if groups0 > pp.COL_GROUP_BLOCK:
        groups0 = -(-groups0 // pp.COL_GROUP_BLOCK) * pp.COL_GROUP_BLOCK
    n_tiles_p = groups0 * pp.KC_REL
    pad_tiles = n_tiles_p - n_chunks

    shell = rdf_cn._shell_volumes(BIN_SIZE, N_BINS)
    normalize = rdf_cn._make_normalizer(
        RELATIONS, counts50, counts50, int(counts50.sum()), True, shell)

    Ld = jnp.asarray(len50, jnp.float32)

    def sorted_side(p):
        return pair_ops.orb_sorted_side(p, n_atoms, n_pad, Ld, codes0)

    def cull_from(pr, pm):
        pos_c3 = pr.reshape(n_chunks, F, 3)
        idx_c3 = pm.reshape(n_chunks, F)
        if pad_tiles:
            pos_c3 = jnp.concatenate(
                [pos_c3, jnp.zeros((pad_tiles, F, 3), jnp.float32)])
            idx_c3 = jnp.concatenate(
                [idx_c3, jnp.full((pad_tiles, F), -1, jnp.int32)])
        return pp._cull_mask_words(
            pr.reshape(n_chunks, LANE, 3), pm.reshape(n_chunks, LANE),
            pos_c3, idx_c3, Ld, R_CUT, True, kc=pp.KC_REL,
            row_tiles=jnp.arange(n_chunks, dtype=jnp.int32))

    def kernel_from(pr, pm, ty):
        full, rels = pp.pair_hist_relations_pallas(
            pr, pm, ty, pr, pm, ty, relations0, Ld, BIN_SIZE, N_BINS,
            R_CUT, exclude_self=True, with_full=True, triangle=True,
            counts_r=counts50)
        return normalize(full, rels, Ld)

    # frame-0 permutation for the stale-perm stages (host-fetched once)
    pm0 = np.asarray(pair_ops.device_sort_orb(
        jnp.asarray(pos50), n_atoms, n_pad, Ld))
    pm0j = jnp.asarray(pm0, jnp.int32)
    ty0 = jnp.where(pm0j >= 0, codes0[jnp.maximum(pm0j, 0)], -1.0)

    def body_full(p):
        pr, pm, ty = sorted_side(p)
        return jnp.sum(kernel_from(pr, pm, ty))

    def body_sort(p):
        pr, pm, ty = sorted_side(p)
        return (jnp.sum(pr) + jnp.sum(pm.astype(jnp.float32))
                + jnp.sum(ty))

    def body_sort_cull(p):
        pr, pm, ty = sorted_side(p)
        m = cull_from(pr, pm)
        return (jnp.sum(pr) + jnp.sum(ty)
                + jnp.sum(m.astype(jnp.float32)))

    def body_staleperm(p):
        pr = pair_ops.gather_padded_perm(p, pm0j)
        return jnp.sum(kernel_from(pr, pm0j, ty0))

    def make_runner(body):
        @jax.jit
        def scan_frames(posT):
            def step(acc, p):
                return acc + body(p), None
            acc0 = jnp.zeros((), jnp.float32) + posT[0, 0, 0] * 0
            acc, _ = lax.scan(step, acc0, posT)
            return acc

        def run(T):
            posT = jnp.asarray(
                np.broadcast_to(pos50, (T,) + pos50.shape).copy())
            return float(scan_frames(posT))  # float() = the host fetch

        return run

    def steady(run):
        run(T_SMALL)
        run(T_BIG)

        def best(T):
            b = float("inf")
            for _ in range(REPEATS):
                t0 = time.time()
                run(T)
                b = min(b, time.time() - t0)
            return b

        ds, db = best(T_SMALL), best(T_BIG)
        if db <= ds * 1.05:
            ds, db = min(ds, best(T_SMALL)), min(db, best(T_BIG))
        return (db - ds) / (T_BIG - T_SMALL)

    out = {"atoms": int(n_atoms), "n_bins": N_BINS, "r_cut": R_CUT,
           "relations": RELATIONS.tolist(), "t_small": T_SMALL,
           "t_big": T_BIG, "repeats": REPEATS}

    stages = {}
    print("stage timings (steady-state ms/frame):", flush=True)
    for name, body in [("sort", body_sort),
                       ("sort_cull", body_sort_cull),
                       ("staleperm", body_staleperm),
                       ("full", body_full)]:
        ms = steady(make_runner(body)) * 1e3
        stages[name] = round(ms, 1)
        print(f"  {name:12s} {ms:8.1f}", flush=True)

    # graded in-kernel ablations of the stale-perm pipeline (see the
    # module docstring): 1 = pre-walk, 2 = pair math only, 3 = loads
    for name, level in [("prewalk", 1), ("valid", 2), ("loads", 3)]:
        pp.REL_ABLATE_LEVEL = level
        try:
            ms = steady(make_runner(body_staleperm)) * 1e3
        finally:
            pp.REL_ABLATE_LEVEL = 0
        stages[name] = round(ms, 1)
        print(f"  {name:12s} {ms:8.1f}", flush=True)

    derived = {
        "orb_sort_in_context_ms": round(
            stages["full"] - stages["staleperm"], 1),
        "cull_mask_ms": round(stages["sort_cull"] - stages["sort"], 1),
        "mxu_column_walk_ms": round(
            stages["staleperm"] - stages["prewalk"], 1),
        "non_walk_kernel_plus_glue_ms": stages["prewalk"],
        "relation_build_plus_compaction_ms": round(
            stages["prewalk"] - stages["valid"], 1),
        "pair_math_ms": round(stages["valid"] - stages["loads"], 1),
        "fixed_per_subtile_plus_xla_glue_ms": stages["loads"],
    }
    out["stages_ms_per_frame"] = stages
    out["derived_ms_per_frame"] = derived
    out["unix_time"] = int(time.time())
    path = os.path.join(HERE, "profile_42k.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(derived))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
