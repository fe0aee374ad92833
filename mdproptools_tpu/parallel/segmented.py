"""
Capped-RSS segmented streaming: bound the tunnel client's per-upload
host-RSS retention by splitting a long trajectory across processes.

Why this exists: the tunneled TPU client retains EVERY uploaded byte in
host RSS for the life of the process (~43-48 MB resident per 44.3 MB
block), and nothing releases it — not deleting the device arrays + gc,
``jax.clear_caches()``, explicit ``.delete()``, re-uploading the same
host buffer, slicing transfers into 1 MiB / 128 KiB pieces, or routing
through jit-arg vs ``device_put`` (measured:
``benchmarks/memory_probe.json`` ``upload_release`` and
``upload_mitigation``). The streamed RDF uploads ~1.2 MB/frame at 42k
atoms (f32 position splits + spatial permutations), so a long enough
stream exhausts any host: ~36 GB retained over a 30k-frame run. The
only real mitigation is a process boundary.

``calc_atomic_rdf_segmented`` runs ``structural.rdf_cn.calc_atomic_rdf``
over consecutive ``frames_per_process``-frame windows, EACH IN A FRESH
CHILD PROCESS, and merges the children's raw partials. Peak RSS is
thereby capped at one segment's footprint regardless of trajectory
length. The frame windows use the cheap ``skip_frames`` seek (cached
blocks seek by index; text files wholly inside the skip are counted by
a byte scan, never tokenized), and a fresh process's device warmup is
small once the machine's tunnel relay is up (measured round 5: the
first process pays the ~140 s relay boot; subsequent processes connect
in seconds).

Semantics: each child returns ``(its frames' summed float64 rows,
frame count)`` — exactly the running total the single-process stream
keeps (``_RdfMeanStream.total``). The parent folds the segment partials
in frame order and divides once by the total frame count. Segments==1
is bit-equal to the direct entry point. Multi-segment agreement with
the unsegmented run depends on the precision path: under the
production TPU default (fast + exact-bins) and under strict, per-frame
float64 rows are re-associated at segment boundaries only — agreement
to the accumulation's last ulp (~1e-15 relative; the per-pair
exactness guarantees of ``exact_bins`` are untouched). Under plain
fast-f32 (``exact_bins=False``, or backends where the exact path is
unavailable) the per-BLOCK f32 device accumulation re-chunks at
segment boundaries, so results agree to the documented f32 envelope
(~1e-6 relative) rather than bitwise — same class of difference as
changing FRAME_BLOCK.

Reference parity: the averaged quantity is the reference's
accumulate-then-divide frame mean (``rdf_cn.py:514-521``); segmentation
is a deployment detail invisible in the output schema.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["calc_atomic_rdf_segmented"]


def _run_child(args: dict, platform, timeout):
    """One segment in a fresh interpreter; returns (total, T)."""
    with tempfile.TemporaryDirectory(prefix="mdpt_seg_") as td:
        argfile = os.path.join(td, "args.json")
        outfile = os.path.join(td, "out.npz")
        with open(argfile, "w") as fh:
            json.dump(args, fh)
        cmd = [sys.executable, "-m",
               "mdproptools_tpu.parallel.segmented",
               "--child", argfile, outfile]
        if platform:
            cmd += ["--platform", platform]
        # forward the parent's persistent compile cache (if configured):
        # without it every segment would pay fresh remote compiles
        try:
            import jax

            cache_dir = jax.config.jax_compilation_cache_dir
        except Exception:  # noqa: BLE001 - jax not imported/configured
            cache_dir = None
        if cache_dir:
            cmd += ["--compile-cache", cache_dir]
        # the child must resolve the SAME package as the parent,
        # wherever the parent imported it from (a checkout on sys.path,
        # an installed site dir, a scratch cwd)
        import mdproptools_tpu

        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(mdproptools_tpu.__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_parent + os.pathsep + env.get(
            "PYTHONPATH", "")
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, env=env)
        if proc.returncode != 0 and not os.path.exists(outfile):
            # a written outfile is authoritative: the tunneled TPU
            # client is known to abort at interpreter TEARDOWN (an
            # uncaught C++ exception if its warmup round trip is still
            # in flight — utilities/device.py), which must not discard
            # a segment's completed, persisted result
            raise RuntimeError(
                f"segment child failed (skip={args['skip_frames']}):\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        with np.load(outfile) as z:
            stats = {"T": int(z["T"]),
                     "peak_rss_gb": float(z["peak_rss_gb"]),
                     "uploaded_gb": float(z["uploaded_bytes"]) / 1e9,
                     "wall_s": float(z["wall_s"])}
            return z["total"], int(z["T"]), stats


def calc_atomic_rdf_segmented(
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
    frames_per_process=8192,
    platform=None,
    child_timeout=24 * 3600,
    stats_out=None,
):
    """``calc_atomic_rdf`` with a hard per-process upload cap: processes
    the trajectory in ``frames_per_process``-frame segments, each in a
    fresh child interpreter, and merges the partials (module docstring
    has the why and the exactness statement).

    ``platform`` optionally pins the children's jax platform (tests pass
    "cpu"; production leaves None = the plugin default). ``stats_out``:
    optional list; per-segment {"T", "peak_rss_gb", "uploaded_gb",
    "wall_s"} dicts are appended (the capped-RSS evidence —
    ``benchmarks/long_stream_capped.py``). Returns the same DataFrame
    as ``calc_atomic_rdf``.
    """
    from mdproptools_tpu.structural.rdf_cn import (
        _radii,
        _save_rdf,
    )

    if frames_per_process <= 0:
        raise ValueError("frames_per_process must be positive")
    base = dict(
        r_cut=float(r_cut), bin_size=float(bin_size),
        num_types=int(num_types),
        mass=list(np.asarray(mass, np.float64)),
        partial_relations=np.asarray(partial_relations).tolist(),
        filename=str(filename),
        num_mols=None if num_mols is None else list(map(int, num_mols)),
        num_atoms_per_mol=(None if num_atoms_per_mol is None
                           else list(map(int, num_atoms_per_mol))),
        precision=str(precision),
        spatial_sort=(spatial_sort if isinstance(spatial_sort, bool)
                      else str(spatial_sort)),
        exact_bins=(exact_bins if isinstance(exact_bins, bool)
                    else str(exact_bins)),
    )
    total = None
    T = 0
    seg = 0
    while True:
        args = dict(base, skip_frames=seg * int(frames_per_process),
                    max_frames=int(frames_per_process))
        try:
            part, t_seg, seg_stats = _run_child(args, platform,
                                                child_timeout)
            if stats_out is not None and t_seg:
                stats_out.append(seg_stats)
        except RuntimeError as exc:
            # the segment start may lie exactly at the end of the
            # stream: the child then sees zero frames and reports the
            # empty-stream error — that is the normal termination when
            # the frame count is a multiple of frames_per_process
            if seg > 0 and "no frames" in str(exc):
                break
            raise
        if t_seg == 0:
            if seg == 0:
                raise ValueError(f"no frames parsed from {filename!r}")
            break
        total = part if total is None else total + part
        T += t_seg
        seg += 1
        if t_seg < frames_per_process:
            break  # short segment == end of stream
    rows = total / T
    num_bins = int(r_cut / bin_size)
    relation_matrix = np.asarray(partial_relations).T
    return _save_rdf(_radii(bin_size, num_bins), relation_matrix,
                     path_or_buff, save_mode, rows[1:], rows[0])


def _child_main(argv):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=2, metavar=("ARGS", "OUT"),
                    required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--compile-cache", default=None)
    ns = ap.parse_args(argv)
    argfile, outfile = ns.child
    if ns.platform or ns.compile_cache:
        import jax

        if ns.platform:
            jax.config.update("jax_platforms", ns.platform)
        if ns.compile_cache:
            jax.config.update("jax_compilation_cache_dir",
                              ns.compile_cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    with open(argfile) as fh:
        args = json.load(fh)

    # peak-RSS sampler: the segment's memory cap IS the product claim,
    # so every child measures and reports it
    import threading
    import time as _time

    peak = [0.0]
    stop = threading.Event()

    def _rss_gb():
        try:
            with open("/proc/self/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1e6
        except OSError:
            pass
        return 0.0

    def _sample():
        while not stop.is_set():
            peak[0] = max(peak[0], _rss_gb())
            stop.wait(2.0)

    threading.Thread(target=_sample, daemon=True).start()
    t0 = _time.time()

    from mdproptools_tpu.structural.rdf_cn import calc_atomic_rdf
    from mdproptools_tpu.utilities.device import uploaded_bytes

    def _finish(total, T):
        stop.set()
        peak[0] = max(peak[0], _rss_gb())
        np.savez(outfile, total=np.asarray(total, np.float64), T=int(T),
                 peak_rss_gb=peak[0], uploaded_bytes=uploaded_bytes(),
                 wall_s=_time.time() - t0)
        return 0

    try:
        total, T = calc_atomic_rdf(
            args["r_cut"], args["bin_size"], args["num_types"],
            args["mass"], args["partial_relations"], args["filename"],
            num_mols=args["num_mols"],
            num_atoms_per_mol=args["num_atoms_per_mol"],
            save_mode=False, precision=args["precision"],
            spatial_sort=args["spatial_sort"],
            exact_bins=args["exact_bins"],
            skip_frames=args["skip_frames"],
            max_frames=args["max_frames"], _return_sum=True,
        )
    except ValueError as exc:
        if "no frames" in str(exc):
            # the entry point started the device warmup round trip
            # before discovering the stream is empty; a process that
            # exits with it still in flight aborts inside the tunnel
            # client at teardown (utilities/device.py) — join it first
            from mdproptools_tpu.utilities.device import warm_device

            warm_device(wait=True)
            return _finish(np.zeros((0,)), 0)
        raise
    return _finish(total, T)


if __name__ == "__main__":
    sys.exit(_child_main(sys.argv[1:]))
