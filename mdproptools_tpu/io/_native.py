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
    if not os.path.exists(path):
        # attempt an on-demand build (toolchain is available in dev envs)
        try:
            import subprocess

            src_dir = os.path.join(
                os.path.dirname(__file__), "..", "..", "native"
            )
            if os.path.exists(os.path.join(src_dir, "Makefile")):
                subprocess.run(
                    ["make", "-C", src_dir, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
        except Exception:
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
