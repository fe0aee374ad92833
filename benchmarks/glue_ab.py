#!/usr/bin/env python
"""
Interleaved kernel-only A/B of the relation-kernel glue knobs at the
42k headline scale (round 5).

Why a separate harness: the production-path sweep (kernel_ab.py sweep)
runs the host ORB permutation inside its timed loop; on this 1-CPU host
that numpy work rides the ~±20% first-touch-fault weather (CLAUDE.md),
which swamps the 5-20 ms/frame deltas these knobs produce — three
identical sweeps disagreed by more than the effects under test. Here
every variant is a pre-jitted scan over a FIXED spatial permutation
(profile_42k's staleperm form — legal, exactness is sort-independent):
the timed call is dispatch + device execute + one fetch, no host numpy.
Variants are interleaved round-robin over R rounds and each reports its
MIN over rounds of (t(T_BIG) - t(T_SMALL)) / (T_BIG - T_SMALL), so slow
tunnel moments hit all variants equally.

Knobs: exact-bins (double-f32) vs plain f32; C_GROUP_REL (main column-
walk width) x TAIL_GROUP. Writes benchmarks/glue_ab.json.
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
T_SMALL, T_BIG, ROUNDS = 4, 24, 3

VARIANTS = [
    # (name, exact_bins, c_group, tail_group)
    ("f32_cg64_t8", False, 64, 8),
    ("f32_cg48_t8", False, 48, 8),
    ("f32_cg32_t8", False, 32, 8),
    ("exact_cg64_t8", True, 64, 8),
    ("exact_cg48_t8", True, 48, 8),
    ("exact_cg32_t8", True, 32, 8),
]


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

    traj = read_trajectory(os.path.join(DATA_DIR, "dump.nvt.0.dump"),
                           columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    L0 = traj.box_lengths[0]
    reps = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]
    pos64 = np.concatenate(
        [traj.cols(["x", "y", "z"])[0] + np.array(r) * L0 for r in reps])
    codes50 = np.tile(codes1, len(reps))
    len64 = np.array([L0[0] * 2, L0[1] * 2, L0[2]], np.float64)
    counts50 = np.bincount(codes50 - 1, minlength=9).astype(np.float64)

    n_atoms = pos64.shape[0]
    LANE = pair_ops.LANE
    n_pad = -(-n_atoms // LANE) * LANE
    codes0 = jnp.asarray(codes50 - 1, jnp.float32)
    relations0 = RELATIONS.astype(np.int64) - 1
    Ld = jnp.asarray(len64, jnp.float32)

    # fixed ORB permutation (host-fetched once, never in a timed region)
    pm0 = np.asarray(pair_ops.device_sort_orb(
        jnp.asarray(pos64, jnp.float32), n_atoms, n_pad, Ld))
    pm0j = jnp.asarray(pm0, jnp.int32)
    ty0 = jnp.where(pm0j >= 0, codes0[jnp.maximum(pm0j, 0)], -1.0)

    # pre-gathered position splits in the fixed sorted order (f64 host
    # gather, exact): hi = f32(x), lo = f32(x - hi)
    gathered64 = np.where(pm0[:, None] >= 0,
                          pos64[np.maximum(pm0, 0)], 0.0)
    ph_np = gathered64.astype(np.float32)
    plo_np = (gathered64 - ph_np).astype(np.float32)
    lh = len64.astype(np.float32)
    llo = (len64 - lh).astype(np.float32)

    def make_body(exact):
        ph = jnp.asarray(ph_np)
        plo = jnp.asarray(plo_np)

        def body(scale):
            # `scale` is the scanned per-frame operand (always 1.0):
            # keeps the scan from collapsing to one iteration while
            # adding no measurable work
            kw = {}
            if exact:
                kw = dict(pos_r_lo=plo * scale, pos_c_lo=plo * scale,
                          lengths_lo=jnp.asarray(llo))
            full, rels = pp.pair_hist_relations_pallas(
                ph * scale, pm0j, ty0, ph * scale, pm0j, ty0,
                relations0, Ld, BIN_SIZE, N_BINS, R_CUT,
                exclude_self=True, with_full=True, triangle=True,
                counts_r=counts50, **kw)
            return jnp.sum(full) + jnp.sum(rels)

        return body

    def make_runner(exact, cg, tail):
        old = (pp.C_GROUP_REL, pp.TAIL_GROUP)
        pp.C_GROUP_REL, pp.TAIL_GROUP = cg, tail
        try:
            body = make_body(exact)

            @jax.jit
            def scan_frames(scales):
                def step(acc, s):
                    return acc + body(s), None
                acc, _ = lax.scan(step, jnp.float32(0.0), scales)
                return acc

            # trace + compile NOW (flags are read at trace time)
            ones4 = jnp.ones((T_SMALL,), jnp.float32)
            ones24 = jnp.ones((T_BIG,), jnp.float32)
            float(scan_frames(ones4))
            float(scan_frames(ones24))
        finally:
            pp.C_GROUP_REL, pp.TAIL_GROUP = old

        def run(T):
            t0 = time.time()
            v = float(scan_frames(ones4 if T == T_SMALL else ones24))
            return time.time() - t0, v

        return run

    runners = {}
    sums = {}
    for name, exact, cg, tail in VARIANTS:
        print(f"compile {name}", flush=True)
        runners[name] = make_runner(exact, cg, tail)

    best = {name: float("inf") for name, *_ in VARIANTS}
    for r in range(ROUNDS):
        for name, *_ in VARIANTS:
            ds, v_small = runners[name](T_SMALL)
            db, v_big = runners[name](T_BIG)
            sums[name] = (v_small, v_big)
            ms = (db - ds) / (T_BIG - T_SMALL) * 1e3
            best[name] = min(best[name], ms)
            print(json.dumps({"round": r, "variant": name,
                              "ms_per_frame": round(ms, 1)}), flush=True)

    # cross-variant exactness: identical scans must agree bit-for-bit
    # within a precision class (sum over T of identical frame sums)
    f32_sums = {n: sums[n] for n, e, *_ in
                [(v[0], v[1]) for v in VARIANTS] if not e}
    ex_sums = {n: sums[n] for n, e, *_ in
               [(v[0], v[1]) for v in VARIANTS] if e}
    for group in (f32_sums, ex_sums):
        vals = list(group.values())
        assert all(v == vals[0] for v in vals), \
            f"variant sums diverge within a precision class: {group}"

    out = {"atoms": int(n_atoms), "t_small": T_SMALL, "t_big": T_BIG,
           "rounds": ROUNDS,
           "best_ms_per_frame": {k: round(v, 1) for k, v in best.items()},
           "note": ("kernel-only staleperm scans, fixed permutation, "
                    "interleaved rounds, min-of-rounds two-length "
                    "delta; excludes host perm + XLA sort (see "
                    "profile_42k.json for the full-step split)"),
           "unix_time": int(time.time())}
    with open(os.path.join(HERE, "glue_ab.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["best_ms_per_frame"]))
    print("wrote glue_ab.json")


if __name__ == "__main__":
    main()
