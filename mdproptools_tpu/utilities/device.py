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

import threading

_lock = threading.Lock()
_thread = None


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
