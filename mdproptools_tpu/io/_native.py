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
        # On-demand (re)build (toolchain present in dev envs), made
        # atomic for concurrent importers (parallel test workers):
        # build to a temp name via the Makefile (the single source of
        # compiler/flags — `make -C native` and this path cannot drift),
        # then os.replace over the target — a concurrent dlopen sees
        # either the old or the new library, never a half-written file.
        # A failed build keeps the old .so (missing new symbols degrade
        # gracefully via hasattr guards).
        tmp = f"{path}.build.{os.getpid()}"
        try:
            import subprocess

            subprocess.run(
                ["make", "-C", src_dir, "-B", f"TARGET={os.path.abspath(tmp)}"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, path)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
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


def _as_ptr_len(text):
    """(c_char_p, byte length) for str, bytes, or a C-contiguous uint8
    ndarray (a zero-copy view into a larger buffer — the dump reader
    passes the ATOMS body this way instead of slicing a multi-MB bytes
    object per frame). The caller must keep ``text`` alive across the C
    call (ctypes holds no reference to an ndarray's memory)."""
    if isinstance(text, np.ndarray):
        if text.dtype != np.uint8 or not text.flags.c_contiguous:
            raise ValueError("ndarray text must be C-contiguous uint8")
        ptr = ctypes.cast(ctypes.c_void_p(text.ctypes.data),
                          ctypes.c_char_p)
        return ptr, text.size
    raw = (text if isinstance(text, bytes)
           else text.encode("ascii", errors="strict"))
    return raw, len(raw)


def _count_newlines(text):
    if isinstance(text, np.ndarray):
        return int(np.count_nonzero(text == 0x0A))
    if isinstance(text, str):
        return text.count("\n")
    return text.count(b"\n")


def parse_floats(text, ncols: int, max_rows=None):
    """Parse a whitespace-separated numeric table (str, bytes, or uint8
    ndarray view) into (rows, ncols) float64, or return None if the
    native library is unavailable or the input is malformed (caller
    falls back). Callers on the hot path pass bytes/uint8 views — the
    str round-trip (decode on read + ascii re-encode here) costs more
    than the tokenizer itself — and ``max_rows`` (the dump header's atom
    count; counting newlines to bound the allocation costs a full extra
    pass over the body)."""
    lib = _load()
    if lib is None:
        return None
    ptr, nbytes = _as_ptr_len(text)
    if max_rows is None:
        # upper bound on rows: number of newlines + 1
        max_rows = _count_newlines(text) + 1
    out = np.empty((max_rows, ncols), np.float64)
    n = lib.mdpt_parse_table(
        ptr,
        nbytes,
        ncols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        return None
    return out[:n]


def parse_floats_cols(text, ncols: int, keep_idx, max_rows=None):
    """Parse only the columns in ``keep_idx`` of a whitespace table
    (str, bytes, or uint8 ndarray view) with ``ncols`` tokens per row;
    skipped tokens are never touched (the SIMD tokenizer jumps over
    them). Returns (rows, len(keep_idx)) float64 with the columns in
    the ORDER requested by ``keep_idx``, or None (caller falls back to
    full parse + select). Raises ValueError on duplicate indices."""
    keep_idx = [int(k) for k in keep_idx]
    if len(set(keep_idx)) != len(keep_idx):
        raise ValueError(f"duplicate column indices in {keep_idx}")
    lib = _load()
    if lib is None or not hasattr(lib, "mdpt_parse_table_cols"):
        return None
    mask = np.zeros(ncols, np.uint8)
    mask[keep_idx] = 1
    n_keep = int(mask.sum())
    ptr, nbytes = _as_ptr_len(text)
    if max_rows is None:
        max_rows = _count_newlines(text) + 1
    out = np.empty((max_rows, n_keep), np.float64)
    n = lib.mdpt_parse_table_cols(
        ptr,
        nbytes,
        ncols,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_keep,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        return None
    # the C pass extracts in FILE order; restore the requested order
    file_order = sorted(keep_idx)
    if file_order != keep_idx:
        out = out[:, [file_order.index(k) for k in keep_idx]]
    return out[:n]
