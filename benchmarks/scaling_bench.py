#!/usr/bin/env python
"""
Atom-count scaling benchmark -> benchmarks/scaling.json.

Replicates the bundled 10,479-atom Mg(TFSI)2/DME box 2x2x1 / 2x2x2 /
2x2x4 (the north-star 50k-atom scale and beyond) and measures the
production RDF path (``rdf_cn._rdf_mean``: device sort + Pallas kernel
dispatch + per-frame normalization, fast/f32) in ms/frame on the real
TPU.

Methodology: steady-state per-frame cost as (t(T=20) - t(T=4)) / 16,
best-of-3 per side with a noise guard — see
``mdproptools_tpu.utilities.benchmarking.steady_state_seconds_per_frame``.

Run: python benchmarks/scaling_bench.py   (JAX_PLATFORMS as shipped)
     python benchmarks/scaling_bench.py strict   (one strict-f64 row at
     the 42k headline scale — the precision/speed trade measured, not
     adjectivized; merges a "strict_row" into scaling.json)
"""

import json
import os
import sys
import time

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
    from mdproptools_tpu.structural import rdf_cn

    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]

    from mdproptools_tpu.utilities.benchmarking import (
        steady_state_seconds_per_frame,
    )

    rows = []
    for reps in [(1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 2, 2), (2, 2, 4),
                 (2, 4, 4), (4, 4, 4)]:
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

        # shorter runs at the largest sizes: frames cost seconds there,
        # and a quarter hour of continuous remote kernel time has been
        # seen to crash the tunneled TPU worker mid-benchmark
        light = {"t_small": 2, "t_big": 6, "repeats": 2} \
            if len(codes) > 400_000 else {}
        dt, noisy, (g_full, _) = steady_state_seconds_per_frame(
            run, **light)
        assert abs(float(g_full[-1]) - 1.0) < 0.05, "g(r->r_cut) != 1"
        row = {
            "atoms": int(len(codes)),
            "ms_per_frame": round(dt * 1000.0, 1),
            "frames_per_s": round(1.0 / dt, 2),
            "box": [round(float(v), 2) for v in L],
        }
        if noisy:
            row["noise_limited"] = True  # upper bound, not a delta
        if light:
            row["methodology"] = ("(t(6) - t(2)) / 4, best-of-2 — "
                                  "shortened runs at this size")
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "workload": ("full+partial RDF, 400 bins, r_cut=20, fast/f32, "
                     "TPU v5e, bundled box tiled"),
        "rows": rows,
        "unix_time": int(time.time()),
        "methodology": (
            "steady-state ms/frame = (t(T=20) - t(T=4)) / 16, best-of-3 "
            "per side with a noise guard (utilities/benchmarking.py), "
            "cancelling per-call re-trace/cache-load (~2-3 s) and the "
            "device fetch (~0.05-0.25 s through the tunnel) that a real "
            "trajectory pays once per 128-frame block, not per frame; "
            "includes the per-frame device sort. Box tiled from the "
            "bundled 49.18 A cube; r_cut 20 A. Kernel dispatch is the "
            "production policy (type-block triangle kernel at small N; "
            "ORB-sorted relation-projected kernel with column compaction "
            "once the cull pays, kept_est < 1.2 — 21k atoms and up "
            "here)."),
    }
    with open(os.path.join(HERE, "scaling.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", os.path.join(HERE, "scaling.json"))


def main_strict():
    """One strict-f64 row at the 42k headline scale (VERDICT r4 task 8):
    precision="strict" resolves to float64 (x64 on), which on TPU means
    EMULATED f64 through the XLA chunked pair path (the Pallas kernel is
    f32-only by policy). Expensive by construction — the point is a
    measured number next to the fast row instead of an adjective. Note
    fast mode's exact-bins path already returns bit-equal g(r) at fast
    cost; strict exists as the reference-semantics oracle mode."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mdproptools_tpu.io.lammps_dump import read_trajectory
    from mdproptools_tpu.ops.precision import resolve_dtype
    from mdproptools_tpu.structural import rdf_cn

    dtype = resolve_dtype("strict")  # enables x64 BEFORE tracing
    traj = read_trajectory(DATA, columns=["id", "type", "x", "y", "z"])
    codes1 = traj.col("type")[0].astype(np.int64)
    pos1 = traj.cols(["x", "y", "z"])[0]
    L1 = traj.box_lengths[0]
    # (1, 1, 1): the 42k strict attempt CRASHES the TPU worker ("TPU
    # worker process crashed or restarted", kernel fault, measured
    # 2026-08-21 — see the strict_row note) — the emulated-f64 XLA pair
    # program at that scale takes the worker down, so the measured
    # strict point is the bundled 10.5k box and 42k is recorded as the
    # crash it is
    reps = (1, 1, 1)
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
            dtype=dtype,
        )

    t0 = time.time()
    g_full, _ = run(1)
    first_s = time.time() - t0  # includes the strict-path compile
    t0 = time.time()
    g3, _ = run(3)
    steady_ms = (time.time() - t0) / 3 * 1e3
    assert abs(float(g_full[-1]) - 1.0) < 0.05
    row = {
        "atoms": int(len(codes)),
        "precision": "strict (float64, emulated on TPU, XLA pair path)",
        "ms_per_frame": round(steady_ms, 1),
        "first_frame_s_with_compile": round(first_s, 1),
        "vs_fast_ms_per_frame": None,  # filled from the fast row below
        "unix_time": int(time.time()),
    }
    path = os.path.join(HERE, "scaling.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
        for r in data.get("rows", []):
            if r["atoms"] == row["atoms"]:
                row["vs_fast_ms_per_frame"] = r["ms_per_frame"]
    data["strict_row"] = row
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(row))
    print("wrote", path)


if __name__ == "__main__":
    if "strict" in sys.argv[1:]:
        main_strict()
    else:
        main()
