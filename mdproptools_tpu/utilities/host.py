"""
Host-memory tuning for streaming trajectory ingestion.

Streaming analysis allocates one ~O(block x N x C) host buffer per
trajectory block (the stacked frame block, its unwrapped-coordinate
views, and the staging copies feeding the device). glibc serves
allocations above M_MMAP_THRESHOLD (dynamic, <= 32 MiB) with a fresh
``mmap`` and returns them with ``munmap`` on free — so every block pays
first-touch page faults for the whole buffer again. On bare metal that
is a minor cost; on the virtualized hosts this framework targets
(lazy/ballooned guest memory, e.g. Firecracker-style microVMs) a first
touch can run at ~10 MB/s while a second touch of the same pages runs
at memcpy speed — measured 150 ms vs 1.6 ms per 1.7 MB frame slot on
the round-3 build host, turning the block allocator into the single
largest cost of the MSD/GK streaming legs (~130 of ~180 ms/frame).

``tune_malloc_for_streaming`` pins M_MMAP_THRESHOLD and
M_TRIM_THRESHOLD high so block-sized buffers come from the sbrk heap
and — crucially — are REUSED across blocks instead of being unmapped:
the same physical pages then serve every block and only the first block
pays the fault cost. Measured effect on the block-fill microbenchmark:
70 / 0.9 / 0.3 ms per frame across three successive fresh-buffer
blocks (vs ~150 ms every block untuned).

Trade-off: the process's heap stays at its high-water mark instead of
returning memory to the OS between blocks. Streaming consumers are
bounded at O(block) buffers by design (a few hundred MB), so this is
the right default for this package; opt out by setting
``MDPT_NO_MALLOC_TUNING=1`` before import (e.g. for short-lived CLI
calls embedded in memory-constrained services).

Called once at package import. No-ops quietly on non-glibc platforms.
"""

import ctypes
import ctypes.util
import os

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def tune_malloc_for_streaming(threshold_bytes: int = 1 << 30) -> bool:
    """Raise glibc's mmap/trim thresholds so block-sized numpy buffers
    are heap-recycled across trajectory blocks (see module docstring).
    Returns True if the tuning was applied."""
    global _applied
    if _applied:
        return True
    if os.environ.get("MDPT_NO_MALLOC_TUNING"):
        return False
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        mallopt = libc.mallopt
        mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
        mallopt.restype = ctypes.c_int
    except (OSError, AttributeError):
        return False
    ok = bool(mallopt(_M_MMAP_THRESHOLD, threshold_bytes))
    ok = bool(mallopt(_M_TRIM_THRESHOLD, threshold_bytes)) and ok
    _applied = ok
    return ok
