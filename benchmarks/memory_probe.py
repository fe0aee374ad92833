#!/usr/bin/env python
"""
Composite-memory accounting probe (VERDICT r3 task #4: the one-parse
north-star composite peaked at 22.2 GB host RSS, ~3x the worst
individual leg, with no accounting).

Runs ``analyze()`` (RDF + MSD + GK) on a scaled slice of the north-star
workload with
  - a sampler thread logging RSS + glibc in-use bytes every 2 s,
  - tracemalloc attribution snapshots (numpy reports its allocations
    via PyTraceMalloc), top allocation sites at peak,
  - the block-buffer pool's live-buffer ledger.

Usage:  python benchmarks/memory_probe.py [n_frames=1010]
Writes benchmarks/memory_probe.json.
"""

import ctypes
import ctypes.util
import json
import os
import sys
import threading
import time
import tracemalloc

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

LINKS = os.path.join(os.path.dirname(HERE), ".ns_links")
MASS = [16.0, 12.01, 1.008, 14.01, 32.06, 16.0, 12.01, 19.0, 24.305]
NUM_MOLS = [591 * 4, 66 * 4, 33 * 4]
NUM_APM = [16, 15, 1]
RELATIONS = [[8, 8, 8, 8], [1, 4, 6, 8]]


def rss_gb():
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def malloc_info():
    """(in_use_gb, free_heap_gb) from glibc mallinfo2 — separates live
    allocations from heap the allocator retains (trim threshold is
    pinned high by utilities/host.py, so freed block buffers stay in
    RSS by design)."""
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")

        class MI(ctypes.Structure):
            _fields_ = [(n, ctypes.c_size_t) for n in
                        ("arena", "ordblks", "smblks", "hblks", "hblkhd",
                         "usmblks", "fsmblks", "uordblks", "fordblks",
                         "keepcost")]

        libc.mallinfo2.restype = MI
        mi = libc.mallinfo2()
        return (mi.uordblks + mi.hblkhd) / 1e9, mi.fordblks / 1e9
    except Exception:
        return None, None


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1010

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # symlink the first n_frames of the north-star view into a tmp dir
    import tempfile

    files = sorted(
        (f for f in os.listdir(LINKS) if f.startswith("dump.ns.")),
        key=lambda f: int(f.split(".")[2]))[:n_frames]
    d = tempfile.mkdtemp(prefix="memprobe_")
    for f in files:
        os.symlink(os.path.realpath(os.path.join(LINKS, f)),
                   os.path.join(d, f))

    samples = []
    top_at_peak = {}
    stop = threading.Event()
    peak_seen = [0.0]

    def sampler():
        while not stop.is_set():
            r = rss_gb()
            used, freeh = malloc_info()
            traced_cur, traced_peak = tracemalloc.get_traced_memory()
            samples.append({
                "t": round(time.time() - t0, 1),
                "rss_gb": round(r, 2),
                "malloc_in_use_gb": None if used is None else round(used, 2),
                "malloc_free_heap_gb": (None if freeh is None
                                        else round(freeh, 2)),
                "traced_py_gb": round(traced_cur / 1e9, 2),
            })
            if r > peak_seen[0] + 0.5:
                peak_seen[0] = r
                snap = tracemalloc.take_snapshot()
                stats = snap.statistics("lineno")[:12]
                top_at_peak.clear()
                top_at_peak["at_rss_gb"] = round(r, 2)
                top_at_peak["top"] = [
                    f"{s.traceback[0].filename.split('/')[-1]}:"
                    f"{s.traceback[0].lineno} {s.size / 1e9:.2f} GB "
                    f"({s.count} blocks)" for s in stats]
            stop.wait(2.0)

    tracemalloc.start(1)
    t0 = time.time()
    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    from mdproptools_tpu import analyze

    try:
        out = analyze(
            os.path.join(d, "dump.ns.*.dump"), 9, MASS,
            num_mols=NUM_MOLS, num_atoms_per_mol=NUM_APM,
            rdf=dict(r_cut=20.0, bin_size=0.05,
                     partial_relations=RELATIONS, save_mode=False),
            msd=dict(msd_type="com", calc_diff=False),
            conductivity=dict(volume=(49.182349 * 2) ** 2 * 49.182349,
                              fit=False),
            precision="fast", working_dir=d,
        )
        g_end = float(out["rdf"]["g_full(r)"].tail(20).mean())
    finally:
        stop.set()
        th.join(5.0)
        tracemalloc.stop()

    wall = time.time() - t0
    import resource

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    from mdproptools_tpu.io import lammps_dump as ld

    pool = ld._block_pool
    pool_rows = [
        {"shape": list(b.shape), "gb": round(b.nbytes / 1e9, 2),
         "refs": sys.getrefcount(b) - 3}
        for b in pool._bufs]
    result = {
        "n_frames": n_frames,
        "wall_s": round(wall, 1),
        "peak_rss_gb": round(peak, 2),
        "g_full_at_r_cut": round(g_end, 4),
        "pool_buffers": pool_rows,
        "top_alloc_sites_at_peak": top_at_peak,
        "samples": samples[-60:],
        "note": ("tracemalloc active (numpy reports through it): parse "
                 "is ~2x slower than production, device legs "
                 "unaffected; RSS peaks are what matters here"),
    }
    path = os.path.join(HERE, "memory_probe.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("n_frames", "wall_s", "peak_rss_gb")}))
    print("\n".join(top_at_peak.get("top", [])))
    print("wrote", path)


if __name__ == "__main__":
    main()
