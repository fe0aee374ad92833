"""
ctypes bindings for the native C++ dump-body parser
(``native/fastparse.cpp``). Built by ``make -C native`` into
``mdproptools_tpu/io/_fastparse.so``; every caller falls back to the
pandas C-engine parser when the library is absent, so the native build
is an optimization, never a requirement.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_fastparse.so")
    src_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    src = os.path.join(src_dir, "fastparse.cpp")
    stale = (os.path.exists(path) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(path))
    if not os.path.exists(path) or stale:
        # attempt an on-demand (re)build (toolchain present in dev envs)
        try:
            import subprocess

            if os.path.exists(os.path.join(src_dir, "Makefile")):
                subprocess.run(
                    ["make", "-C", src_dir, "-s"] + (["-B"] if stale
                                                     else []),
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
        except Exception:
            if not os.path.exists(path):
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mdpt_parse_table.restype = ctypes.c_int64
        lib.mdpt_parse_table.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        # column-masked variant (absent in older builds -> guarded)
        if hasattr(lib, "mdpt_parse_table_cols"):
            lib.mdpt_parse_table_cols.restype = ctypes.c_int64
            lib.mdpt_parse_table_cols.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def parse_floats(text: str, ncols: int):
    """Parse a whitespace-separated numeric table into (rows, ncols)
    float64, or return None if the native library is unavailable or the
    input is malformed (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode("ascii", errors="strict")
    # upper bound on rows: number of newlines + 1
    max_rows = raw.count(b"\n") + 1
    out = np.empty((max_rows, ncols), np.float64)
    n = lib.mdpt_parse_table(
        raw,
        len(raw),
        ncols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        return None
    return out[:n]


def parse_floats_cols(text: str, ncols: int, keep_idx):
    """Parse only the columns in ``keep_idx`` (file order preserved) of
    a whitespace table with ``ncols`` tokens per row; skipped tokens are
    byte-scanned, not converted. Returns (rows, len(keep_idx)) float64
    or None (caller falls back to full parse + select)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mdpt_parse_table_cols"):
        return None
    keep_idx = sorted(int(k) for k in keep_idx)
    mask = np.zeros(ncols, np.uint8)
    mask[keep_idx] = 1
    n_keep = int(mask.sum())
    raw = text.encode("ascii", errors="strict")
    max_rows = raw.count(b"\n") + 1
    out = np.empty((max_rows, n_keep), np.float64)
    n = lib.mdpt_parse_table_cols(
        raw,
        len(raw),
        ncols,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_keep,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        return None
    return out[:n]
