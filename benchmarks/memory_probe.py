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


def dispatch_probe(n_iters: int = 200):
    """Isolate the composite's ~2-4 MB/frame RSS growth: the probe's
    time series shows malloc IN-USE growing with RSS while tracemalloc
    stays flat, i.e. live C-level allocations. This mode dispatches a
    block-shaped jitted program against the real backend with (A) one
    resident device input re-executed N times and (B) a fresh 44 MB
    host->device upload per iteration, sampling RSS + mallinfo each 10
    dispatches. A nonzero slope in (A) pins the growth on per-dispatch
    client retention; (B)-only growth pins it on transfer staging.
    Merges a ``dispatch_growth`` row into memory_probe.json."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    shape = (66, 41916, 4)  # one capped trajectory block, f32
    x_np = np.random.default_rng(0).random(shape).astype(np.float32)

    @jax.jit
    def step(x):
        return jnp.sum(x * 1.0001, axis=(0, 1))

    rows = []

    def snap(phase, i):
        used, freeh = malloc_info()
        rows.append({
            "phase": phase, "i": i, "rss_gb": round(rss_gb(), 3),
            "malloc_in_use_gb": None if used is None else round(used, 3),
        })

    xd = jax.device_put(x_np)
    np.asarray(step(xd))  # compile + first transfer outside the window
    t0 = time.time()
    snap("exec_only", 0)
    for i in range(n_iters):
        np.asarray(step(xd))
        if i % 10 == 9:
            snap("exec_only", i + 1)
    snap("upload_exec", 0)
    for i in range(n_iters):
        np.asarray(step(jax.device_put(x_np)))
        if i % 10 == 9:
            snap("upload_exec", i + 1)
    wall = time.time() - t0

    def slope(phase):
        ph = [r for r in rows if r["phase"] == phase]
        di = ph[-1]["i"] - ph[0]["i"]
        return {
            "rss_mb_per_dispatch": round(
                (ph[-1]["rss_gb"] - ph[0]["rss_gb"]) * 1e3 / di, 3),
            "malloc_in_use_mb_per_dispatch": round(
                (ph[-1]["malloc_in_use_gb"] - ph[0]["malloc_in_use_gb"])
                * 1e3 / di, 3) if ph[0]["malloc_in_use_gb"] is not None
            else None,
        }

    row = {
        "n_iters": n_iters,
        "wall_s": round(wall, 1),
        "block_mb_uploaded_per_iter": round(x_np.nbytes / 1e6, 1),
        "exec_only": slope("exec_only"),
        "upload_exec": slope("upload_exec"),
        "samples": rows,
        "backend": jax.devices()[0].platform,
    }
    path = os.path.join(HERE, "memory_probe.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    data["dispatch_growth"] = row
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps({k: row[k] for k in
                      ("n_iters", "exec_only", "upload_exec")}))


def release_probe(n_uploads: int = 24):
    """Follow-up to ``dispatch_probe``: every host->device upload retains
    its full buffer size in host RSS (43.2 MB per 44 MB block). This mode
    asks whether ANYTHING releases it: (a) device arrays held live then
    deleted + gc, (b) ``jax.clear_caches()``, (c) a sync fetch, (d) time.
    Also re-checks the temporaries case (upload consumed immediately, no
    Python reference survives the iteration) to separate "tied to the
    live device buffer" from "leaked by the transfer path".
    Merges an ``upload_release`` row into memory_probe.json."""
    import gc

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    shape = (66, 41916, 4)  # 44.3 MB f32, one capped trajectory block
    x_np = np.random.default_rng(0).random(shape).astype(np.float32)

    @jax.jit
    def step(x):
        return jnp.sum(x * 1.0001, axis=(0, 1))

    def snap(label, rows):
        used, freeh = malloc_info()
        rows.append({"label": label, "rss_gb": round(rss_gb(), 3),
                     "malloc_in_use_gb":
                         None if used is None else round(used, 3)})
        return rows[-1]

    rows = []
    xd = jax.device_put(x_np)
    np.asarray(step(xd))  # compile outside the window
    base = snap("baseline", rows)

    # (1) uploads HELD live in a list
    held = [jax.device_put(x_np) for _ in range(n_uploads)]
    np.asarray(step(held[-1]))
    after_held = snap("after_held_uploads", rows)
    del held
    gc.collect()
    np.asarray(step(xd))  # sync point
    after_del = snap("after_del_gc_sync", rows)
    jax.clear_caches()
    gc.collect()
    np.asarray(step(xd))
    after_clear = snap("after_clear_caches", rows)
    time.sleep(5.0)
    after_sleep = snap("after_sleep_5s", rows)

    # (2) uploads as TEMPORARIES (consumed and dropped immediately)
    base2 = snap("baseline2", rows)
    for _ in range(n_uploads):
        np.asarray(step(jax.device_put(x_np)))
    after_tmp = snap("after_temp_uploads", rows)
    gc.collect()
    jax.clear_caches()
    gc.collect()
    np.asarray(step(xd))
    time.sleep(5.0)
    after_tmp_release = snap("after_temp_release_attempts", rows)

    mb = x_np.nbytes / 1e6

    def delta(a, b):
        return round((b["rss_gb"] - a["rss_gb"]) * 1e3 / n_uploads, 1)

    row = {
        "n_uploads": n_uploads,
        "block_mb": round(mb, 1),
        "held_rss_mb_per_upload": delta(base, after_held),
        "held_after_del_gc_mb_per_upload": delta(base, after_del),
        "held_after_clear_caches_mb_per_upload": delta(base, after_clear),
        "held_after_sleep_mb_per_upload": delta(base, after_sleep),
        "temp_rss_mb_per_upload": delta(base2, after_tmp),
        "temp_after_release_attempts_mb_per_upload":
            delta(base2, after_tmp_release),
        "samples": rows,
        "backend": jax.devices()[0].platform,
    }
    path = os.path.join(HERE, "memory_probe.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    data["upload_release"] = row
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps({k: v for k, v in row.items() if k != "samples"}))


def mitigate_probe(n_uploads: int = 16):
    """Round-5 follow-up to ``release_probe`` (which showed 43.2 MB of
    host RSS retained per 44.3 MB upload, not released by del/gc/
    clear_caches/time, even when the SAME host buffer is re-uploaded):
    probe candidate mitigations for the axon client's per-transfer
    retention.

      delete     consume then explicitly ``.delete()`` the device array
      chunk1m    upload each block as 1 MiB pieces + on-device concat
                 (tests an inline-literal / staging size threshold)
      chunk128k  same with 128 KiB pieces
      jitarg     pass the np array straight to a jitted function
                 (committed-arg upload path) instead of device_put

    Merges an ``upload_mitigation`` row into memory_probe.json."""
    import gc

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    shape = (66, 41916, 4)  # 44.3 MB f32, one capped trajectory block
    x_np = np.random.default_rng(0).random(shape).astype(np.float32)
    flat = x_np.reshape(-1)

    @jax.jit
    def step(x):
        return jnp.sum(x * 1.0001)

    @jax.jit
    def step_flat(x):
        return jnp.sum(x * 1.0001)

    def consume(xd):
        return float(step(xd) if xd.ndim == 3 else step_flat(xd))

    def measure(name, fn, rows):
        gc.collect()
        consume(jax.device_put(flat))  # sync + compile outside window
        r0 = rss_gb()
        for i in range(n_uploads):
            fn(i)
        gc.collect()
        consume(jax.device_put(flat))
        d = round((rss_gb() - r0) * 1e3 / n_uploads, 1)
        rows[name] = d
        print(f"  {name:10s} {d:8.1f} MB retained per {x_np.nbytes/1e6:.1f} MB upload",
              flush=True)

    def up_delete(i):
        xd = jax.device_put(x_np)
        consume(xd)
        xd.delete()

    def up_chunk(piece_bytes):
        n = max(1, piece_bytes // 4)

        def go(i):
            parts = [jax.device_put(flat[s:s + n])
                     for s in range(0, flat.size, n)]
            xd = jnp.concatenate(parts)
            consume(xd)

        return go

    def up_jitarg(i):
        consume(step_flat(flat))

    rows = {}
    measure("delete", up_delete, rows)
    measure("chunk1m", up_chunk(1 << 20), rows)
    measure("chunk128k", up_chunk(1 << 17), rows)
    measure("jitarg", up_jitarg, rows)

    path = os.path.join(HERE, "memory_probe.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    data["upload_mitigation"] = {
        "n_uploads": n_uploads, "block_mb": round(x_np.nbytes / 1e6, 1),
        "retained_mb_per_upload": rows,
        "backend": jax.devices()[0].platform,
    }
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(data["upload_mitigation"]))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dispatch":
        dispatch_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 200)
    elif len(sys.argv) > 1 and sys.argv[1] == "release":
        release_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 24)
    elif len(sys.argv) > 1 and sys.argv[1] == "mitigate":
        mitigate_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    else:
        main()
