"""
Background device (tunnel) warmup.

The first device->host round trip of a process through the tunneled
TPU backend pays ~140-175 s of connection warmup (measured round 5:
import 0 s, ``jax.devices()`` 0.08 s, first dispatch 0.9 s, FIRST FETCH
141 s; the round-4 composite's per-block log shows the same cost inside
the first ``frame_block`` stage, ``benchmarks/composite_cached_r4.log``).
That latency is fixed per process — the only lever is overlapping it
with host work instead of serializing it in front of the first real
dispatch.

``warm_device()`` starts ONE daemon thread per process that performs a
trivial round trip (create a scalar on device, fetch it). DEVICE-USING
consumers call it on entry (the rdf_cn streaming entry points and the
composite ``pipeline.analyze``), so by the time the first parsed/
cache-read block reaches the device the connection is established or at
least already in progress. No-op on the cpu backend and on every call
after the first.

Only call this from paths that WILL synchronize with the device: a
process that warms but never fetches can reach interpreter teardown
with the warmup fetch still in flight inside the tunnel client, which
aborts with an uncaught C++ exception (observed when the all-host GK
leg warmed from the io layer). Device-using paths are safe — their own
first fetch queues behind the warmup round trip, so the thread is done
before results exist.
"""

import os
import threading

_lock = threading.Lock()
_thread = None

# ---------------------------------------------------------------------------
# Upload-retention accounting.
#
# The tunneled TPU client retains EVERY uploaded byte in host RSS for the
# life of the process: measured 43-48 MB resident per 44.3 MB uploaded
# block, released by nothing — not deletion + gc, jax.clear_caches(),
# explicit .delete(), time, re-uploading the same host buffer, slicing the
# transfer into 1 MiB or 128 KiB pieces, or routing through jit-arg vs
# device_put (benchmarks/memory_probe.json "upload_release" and
# "upload_mitigation"). Host->device bytes are therefore a per-process
# BUDGET. The streaming device feeds report their uploads here; when the
# running total crosses the warn threshold (MDPT_UPLOAD_WARN_GB env var,
# default 16), one warning points the user at the capped segmented runner
# (parallel.segmented), which bounds the per-process total by construction.
# ---------------------------------------------------------------------------
_uploaded_bytes = 0
_upload_warned = False


def note_upload(nbytes: int) -> None:
    """Account ``nbytes`` of host->device transfer against the process
    upload budget (no-op warning below the threshold; cheap always)."""
    global _uploaded_bytes, _upload_warned
    import jax

    if jax.default_backend() == "cpu":
        return
    _uploaded_bytes += int(nbytes)
    if not _upload_warned:
        warn_gb = float(os.environ.get("MDPT_UPLOAD_WARN_GB", "16"))
        if _uploaded_bytes > warn_gb * 1e9:
            _upload_warned = True
            from mdproptools_tpu.utilities.tracing import logger

            logger.warning(
                "%.1f GB uploaded to the TPU this process; the tunnel "
                "client retains uploaded bytes in host RSS for the "
                "process lifetime (see benchmarks/memory_probe.json). "
                "For longer streams run the capped segmented driver "
                "(mdproptools_tpu.parallel.segmented, or mdpt rdf "
                "--frames-per-process), or raise MDPT_UPLOAD_WARN_GB "
                "to silence this.", _uploaded_bytes / 1e9)


def uploaded_bytes() -> int:
    """Total host->device bytes accounted this process."""
    return _uploaded_bytes


def _roundtrip():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        np.asarray(jnp.zeros(8))  # a FETCH: dispatch alone doesn't sync
    except Exception:  # noqa: BLE001
        # warmup is best-effort: a failing backend will surface its real
        # error on the first genuine dispatch, with a better traceback
        pass


def warm_device(wait: bool = False) -> None:
    """Begin (or join, with ``wait=True``) the one-per-process device
    warmup round trip. Safe to call from any thread, any number of
    times; cpu backend is a no-op."""
    global _thread
    import jax

    if jax.default_backend() == "cpu":
        return
    with _lock:
        if _thread is None:
            _thread = threading.Thread(
                target=_roundtrip, name="mdpt-device-warmup", daemon=True)
            _thread.start()
        t = _thread
    if wait:
        t.join()
