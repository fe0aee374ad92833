#!/usr/bin/env python
"""A/B relation-kernel variants on the real TPU at the 42k/84k-atom
scale (tiled bundled box, production dispatch path via rdf_cn._rdf_mean).
Currently: ceil column walk vs main+tail walk. Prints JSON rows.
(The int8-dot A/B this file was born for is dead: Mosaic rejects i8
vectors — see REL_DOT_INT8 in ops/pairs_pallas.py.)"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402

DATA = "/root/reference/data/mg_tfsi_dme/dump.nvt.5000000.dump"
RELATIONS = np.array([[8, 1], [8, 4], [8, 6], [8, 8]])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.ops import pairs_pallas
    from mdproptools_tpu.structural import rdf_cn
    from mdproptools_tpu.utilities.benchmarking import (
        steady_state_seconds_per_frame,
    )

    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]

    for reps in [(2, 2, 1)]:
        shifts = [(i, j, k) for i in range(reps[0])
                  for j in range(reps[1]) for k in range(reps[2])]
        pos = np.concatenate([pos1 + np.array(s) * L1 for s in shifts])
        codes = np.tile(codes1, len(shifts))
        L = L1 * np.array(reps)
        counts = np.bincount(codes - 1, minlength=9).astype(np.float64)

        def run(T):
            posT = np.broadcast_to(pos, (T,) + pos.shape).copy()
            lenT = np.broadcast_to(L, (T, 3)).copy()
            return rdf_cn._rdf_mean(
                posT, codes, 9, lenT, 0.05, 400, 20.0, RELATIONS,
                counts, counts, exclude_self=True, with_full=True,
                dtype=jnp.float32,
            )

        results = {}
        for name, flag in [("ceil", False), ("tail", True)]:
            pairs_pallas.REL_TAIL_WALK = flag
            rdf_cn._STEP_CACHE.clear()
            dt, noisy, (g_full, g_part) = steady_state_seconds_per_frame(
                run, t_small=2, t_big=8, repeats=2)
            results[name] = {
                "ms_per_frame": round(dt * 1000.0, 1),
                "noise_limited": bool(noisy),
                "hist": (np.asarray(g_full, np.float64),
                         np.asarray(g_part, np.float64)),
            }
            print(json.dumps({"atoms": len(codes), "dot": name,
                              "ms_per_frame": results[name]["ms_per_frame"],
                              "noise_limited": bool(noisy)}), flush=True)
        a, b = results["ceil"]["hist"], results["tail"]["hist"]
        exact = (np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]))
        print(json.dumps({"atoms": len(codes), "bit_equal": bool(exact)}),
              flush=True)
        assert exact, "tail-walk kernel != ceil-walk kernel"


def main_dispatch():
    """rel kernel vs type-block kernel WITH in-kernel column compaction
    (the round-3 addition: compaction ported to the type-block kernel,
    which pays no per-pair relation-mask cost because tiles are
    single-typed). Bit-equality of the normalized RDF rows is asserted
    across kernels (both are exact-count schemes)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.structural import rdf_cn
    from mdproptools_tpu.utilities.benchmarking import (
        steady_state_seconds_per_frame,
    )

    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]

    sizes = [(1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 2, 2)]
    for reps in sizes:
        shifts = [(i, j, k) for i in range(reps[0])
                  for j in range(reps[1]) for k in range(reps[2])]
        pos = np.concatenate([pos1 + np.array(s) * L1 for s in shifts])
        codes = np.tile(codes1, len(shifts))
        L = L1 * np.array(reps)
        counts = np.bincount(codes - 1, minlength=9).astype(np.float64)

        def run(T):
            posT = np.broadcast_to(pos, (T,) + pos.shape).copy()
            lenT = np.broadcast_to(L, (T, 3)).copy()
            return rdf_cn._rdf_mean(
                posT, codes, 9, lenT, 0.05, 400, 20.0, RELATIONS,
                counts, counts, exclude_self=True, with_full=True,
                dtype=jnp.float32,
            )

        results = {}
        for name in ("rel", "type-block"):
            rdf_cn._FORCE_KERNEL = name
            rdf_cn._STEP_CACHE.clear()
            dt, noisy, (g_full, g_part) = steady_state_seconds_per_frame(
                run, t_small=2, t_big=8, repeats=2)
            results[name] = {
                "ms": round(dt * 1000.0, 1),
                "hist": (np.asarray(g_full, np.float64),
                         np.asarray(g_part, np.float64)),
            }
            print(json.dumps({"atoms": len(codes), "kernel": name,
                              "ms_per_frame": results[name]["ms"],
                              "noise_limited": bool(noisy)}), flush=True)
        rdf_cn._FORCE_KERNEL = None
        a, b = results["rel"]["hist"], results["type-block"]["hist"]
        exact = (np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]))
        print(json.dumps({"atoms": len(codes), "bit_equal": bool(exact)}),
              flush=True)
        assert exact, "type-block kernel != rel kernel"


def main_lane_split():
    """G=2 lane-split column pairing vs the unsplit walk (both with the
    remainder-block full encoding), production dispatch at 42k/84k.
    Bit-equality of the normalized rows is asserted."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.ops import pairs_pallas
    from mdproptools_tpu.structural import rdf_cn
    from mdproptools_tpu.utilities.benchmarking import (
        steady_state_seconds_per_frame,
    )

    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]

    sizes = [(2, 2, 1), (2, 2, 2)]
    if "small" in sys.argv[1:]:
        sizes = [(2, 2, 1)]
    for reps in sizes:
        shifts = [(i, j, k) for i in range(reps[0])
                  for j in range(reps[1]) for k in range(reps[2])]
        pos = np.concatenate([pos1 + np.array(s) * L1 for s in shifts])
        codes = np.tile(codes1, len(shifts))
        L = L1 * np.array(reps)
        counts = np.bincount(codes - 1, minlength=9).astype(np.float64)

        def run(T):
            posT = np.broadcast_to(pos, (T,) + pos.shape).copy()
            lenT = np.broadcast_to(L, (T, 3)).copy()
            return rdf_cn._rdf_mean(
                posT, codes, 9, lenT, 0.05, 400, 20.0, RELATIONS,
                counts, counts, exclude_self=True, with_full=True,
                dtype=jnp.float32,
            )

        results = {}
        for name, flag in [("unsplit", False), ("lane-split", True)]:
            pairs_pallas.REL_LANE_SPLIT = flag
            rdf_cn._FORCE_KERNEL = "rel"
            rdf_cn._STEP_CACHE.clear()
            dt, noisy, (g_full, g_part) = steady_state_seconds_per_frame(
                run, t_small=2, t_big=8, repeats=2)
            results[name] = {
                "ms": round(dt * 1000.0, 1),
                "hist": (np.asarray(g_full, np.float64),
                         np.asarray(g_part, np.float64)),
            }
            print(json.dumps({"atoms": len(codes), "walk": name,
                              "ms_per_frame": results[name]["ms"],
                              "noise_limited": bool(noisy)}), flush=True)
        rdf_cn._FORCE_KERNEL = None
        pairs_pallas.REL_LANE_SPLIT = True
        a, b = results["unsplit"]["hist"], results["lane-split"]["hist"]
        exact = (np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]))
        print(json.dumps({"atoms": len(codes), "bit_equal": bool(exact)}),
              flush=True)
        assert exact, "lane-split kernel != unsplit kernel"


def main_sweep():
    """Round-5 glue sweep at the 42k headline scale, production dispatch
    (``rdf_cn._rdf_mean``): (a) exact-bins (the new production default)
    vs plain f32 — the 42k cost of the double-f32 upgrade was never
    measured; (b) (C_GROUP_REL, TAIL_GROUP) walk-width variants — the
    64/8 choice predates column compaction + tail walk, under which the
    mean kept-subtile active-column count (~54) never fills a 64-wide
    main trip. f32 variants must be bit-equal to the f32 base; exact
    variants bit-equal to the exact base."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.ops import pairs_pallas
    from mdproptools_tpu.structural import rdf_cn
    from mdproptools_tpu.utilities.benchmarking import (
        steady_state_seconds_per_frame,
    )

    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]
    reps = (2, 2, 1)
    shifts = [(i, j, k) for i in range(reps[0])
              for j in range(reps[1]) for k in range(reps[2])]
    pos = np.concatenate([pos1 + np.array(s) * L1 for s in shifts])
    codes = np.tile(codes1, len(shifts))
    L = L1 * np.array(reps)
    counts = np.bincount(codes - 1, minlength=9).astype(np.float64)

    def make_run(exact):
        def run(T):
            posT = np.broadcast_to(pos, (T,) + pos.shape).copy()
            lenT = np.broadcast_to(L, (T, 3)).copy()
            return rdf_cn._rdf_mean(
                posT, codes, 9, lenT, 0.05, 400, 20.0, RELATIONS,
                counts, counts, exclude_self=True, with_full=True,
                dtype=jnp.float32, exact_bins=exact,
            )
        return run

    base_cg = pairs_pallas.C_GROUP_REL
    base_tail = pairs_pallas.TAIL_GROUP
    variants = [
        ("f32_base", False, base_cg, base_tail),
        ("exact_base", True, base_cg, base_tail),
        ("f32_cg32_t8", False, 32, 8),
        ("f32_cg64_t16", False, 64, 16),
        ("f32_cg64_t4", False, 64, 4),
        ("f32_cg32_t16", False, 32, 16),
    ]
    if "fine" in sys.argv[1:]:
        # second pass around the first sweep's winner (32, 8)
        variants = [
            ("f32_base", False, base_cg, base_tail),
            ("exact_base", True, base_cg, base_tail),
            ("f32_cg48_t8", False, 48, 8),
            ("f32_cg16_t8", False, 16, 8),
            ("f32_cg32_t8", False, 32, 8),
            ("exact_cg32_t8", True, 32, 8),
        ]
    results = {}
    for name, exact, cg, tail in variants:
        pairs_pallas.C_GROUP_REL = cg
        pairs_pallas.TAIL_GROUP = tail
        rdf_cn._FORCE_KERNEL = "rel"
        rdf_cn._STEP_CACHE.clear()
        try:
            dt, noisy, (g_full, g_part) = steady_state_seconds_per_frame(
                make_run(exact), t_small=2, t_big=8, repeats=2)
        finally:
            pairs_pallas.C_GROUP_REL = base_cg
            pairs_pallas.TAIL_GROUP = base_tail
            rdf_cn._FORCE_KERNEL = None
        results[name] = {
            "ms": round(dt * 1000.0, 1), "exact": exact,
            "hist": (np.asarray(g_full, np.float64),
                     np.asarray(g_part, np.float64)),
        }
        print(json.dumps({"atoms": len(codes), "variant": name,
                          "ms_per_frame": results[name]["ms"],
                          "noise_limited": bool(noisy)}), flush=True)
    for name, r in results.items():
        base = results["exact_base" if r["exact"] else "f32_base"]
        same = (np.array_equal(r["hist"][0], base["hist"][0])
                and np.array_equal(r["hist"][1], base["hist"][1]))
        print(json.dumps({"variant": name, "bit_equal_to_base": bool(same)}),
              flush=True)
        assert same, f"{name} differs from its precision base"


if __name__ == "__main__":
    if "dispatch" in sys.argv[1:]:
        main_dispatch()
    elif "lane_split" in sys.argv[1:]:
        main_lane_split()
    elif "sweep" in sys.argv[1:]:
        main_sweep()
    else:
        main()
