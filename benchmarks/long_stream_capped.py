#!/usr/bin/env python
"""
Capped-RSS long-stream RDF (VERDICT r4 task #3's "Done" measurement):
a >=30k-frame, 42k-atom stream through ``calc_atomic_rdf_segmented``
with per-segment peak-RSS and uploaded-bytes evidence.

Why segmentation is the mitigation (and not a buffer ring/donation):
the tunnel client retains ~1x every uploaded byte in host RSS for the
process lifetime and NOTHING releases it — measured across delete+gc,
clear_caches, .delete(), same-buffer re-upload, 1 MiB / 128 KiB chunked
transfers, and jit-arg routing (``memory_probe.json`` upload_release +
upload_mitigation). The streamed RDF uploads ~1.2 MB/frame at 42k
(f32 hi+lo position splits + int32 spatial perms), so an unsegmented
30k-frame run would retain ~uploads_total GB; each segment child caps
that at frames_per_process's worth by construction.

Workload: the north-star 41,916-atom tiled frames (synthesized by
``north_star_bench.synth`` if absent), symlink-replicated in pseudo-time
to N_FRAMES files; production entry point, fast precision (exact-bins
auto), 200 bins, r_cut 10 — the retention under test scales with
frames x atoms (position uploads), not with the cutoff, and the
lighter pair workload keeps the 30k-frame drive to ~1 h.

Writes benchmarks/long_stream_capped.json.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np  # noqa: E402,F401

from north_star_bench import (  # noqa: E402
    CACHE,
    MASS,
    RELATIONS,
    synth,
)

LONG_LINKS = os.path.join(os.path.dirname(HERE), ".ns_long")
N_FRAMES = 30_000
FRAMES_PER_PROCESS = 10_000
OUT = os.path.join(HERE, "long_stream_capped.json")


def build_links():
    synth()  # ensures the 101 tiled 42k-atom base frames exist
    os.makedirs(LONG_LINKS, exist_ok=True)
    files_c = sorted(
        (f for f in os.listdir(CACHE) if f.startswith("dump.ns.")),
        key=lambda f: int(f.split(".")[2]),
    )
    step = int(files_c[1].split(".")[2]) - int(files_c[0].split(".")[2])
    span = int(files_c[-1].split(".")[2]) + step
    made = 0
    rep = 0
    while made < N_FRAMES:
        for f in files_c:
            if made >= N_FRAMES:
                break
            ts = int(f.split(".")[2]) + rep * span
            link = os.path.join(LONG_LINKS, f"dump.ns.{ts}.dump")
            if not os.path.islink(link):
                os.symlink(os.path.join(CACHE, f), link)
            made += 1
        rep += 1
    print(f"{made} frame links in {LONG_LINKS}", flush=True)


def main():
    build_links()
    pattern = os.path.join(LONG_LINKS, "dump.ns.*.dump")

    import jax

    # forwarded to every segment child (parallel.segmented reads it)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mdproptools_tpu.parallel.segmented import (
        calc_atomic_rdf_segmented,
    )

    stats = []
    t0 = time.time()
    # r_cut 10 (200 bins): the quantity under test is the client's
    # per-upload RSS retention, which depends on FRAMES x ATOMS only
    # (position splits + spatial perms), not on the cutoff; the smaller
    # pair workload keeps the 30k-frame drive to ~1 h instead of ~2.5
    df = calc_atomic_rdf_segmented(
        10.0, 0.05, 9, MASS, RELATIONS, pattern,
        path_or_buff=os.path.join(HERE, "long_stream_rdf.csv"),
        frames_per_process=FRAMES_PER_PROCESS, stats_out=stats,
    )
    wall = time.time() - t0
    g_tail = float(df["g_full(r)"].iloc[-1])
    uploads_total = sum(s["uploaded_gb"] for s in stats)
    row = {
        "workload": (f"{N_FRAMES} frames x 41,916 atoms, 200 bins, "
                     "r_cut 10, production calc_atomic_rdf_segmented "
                     "(fast precision, exact-bins auto), text-parsed"),
        "n_frames": N_FRAMES,
        "frames_per_process": FRAMES_PER_PROCESS,
        "segments": stats,
        "wall_s": round(wall, 1),
        "frames_per_s": round(N_FRAMES / wall, 2),
        "peak_rss_gb_any_process": round(
            max(s["peak_rss_gb"] for s in stats), 2),
        "uploaded_gb_total": round(uploads_total, 2),
        "projected_unsegmented_retention_gb": round(uploads_total, 2),
        "g_full_at_r_cut": round(g_tail, 4),
        "unix_time": int(time.time()),
    }
    with open(OUT, "w") as fh:
        json.dump(row, fh, indent=1)
    print(json.dumps({k: v for k, v in row.items() if k != "segments"}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
