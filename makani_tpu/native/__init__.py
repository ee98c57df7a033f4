"""Native (C++) runtime components, ctypes-bound.

``reader`` — thread-pool pread block reader (reader.cpp), the native
counterpart of the reference's DALI reader layer. Compiled lazily with g++
on first use; everything degrades to the pure-Python paths when no
toolchain is available (the .so is not checked in).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_reader", "read_blocks"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libreader.so")
_SRC_PATH = os.path.join(_HERE, "reader.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC_PATH, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_reader():
    """ctypes handle to the native reader, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # stale binary for another arch: rebuild once
            if not _build():
                return None
            lib = ctypes.CDLL(_LIB_PATH)
        lib.mk_read_blocks.restype = ctypes.c_int
        lib.mk_read_blocks.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def read_blocks(path: str, offsets, sizes, out: np.ndarray, dest_offsets, nthreads: int = 0) -> None:
    """Read ``len(offsets)`` byte blocks from ``path`` into ``out``.

    ``offsets``/``sizes``/``dest_offsets`` are uint64 arrays (bytes); ``out``
    must be a writable C-contiguous array. Runs outside the GIL (ctypes).
    Raises OSError on any read failure.
    """
    lib = get_reader()
    if lib is None:
        raise RuntimeError("native reader unavailable (no toolchain)")
    offsets = np.ascontiguousarray(offsets, np.uint64)
    sizes = np.ascontiguousarray(sizes, np.uint64)
    dest_offsets = np.ascontiguousarray(dest_offsets, np.uint64)
    assert out.flags["C_CONTIGUOUS"] and out.flags["WRITEABLE"]
    n = len(offsets)
    rc = lib.mk_read_blocks(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.c_char_p),
        dest_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        nthreads,
    )
    if rc != 0:
        raise OSError(rc, f"native read failed: {os.strerror(rc)} ({path})")
