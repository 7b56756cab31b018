"""Compile-on-first-use loader for the native library."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

__all__ = ["load_library", "native_available"]

_SRC = Path(__file__).parent / "pathfinder.cpp"
_SO = Path(__file__).parent / "_tneq_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None if unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _failed = True
            return None
        lib.tneq_find_path.restype = ctypes.c_int
        lib.tneq_find_path.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tneq_path_cost.restype = ctypes.c_int
        lib.tneq_path_cost.argtypes = lib.tneq_find_path.argtypes[:-1] + [
            ctypes.POINTER(ctypes.c_double)
        ]
        lib.tneq_find_path_dp.restype = ctypes.c_int
        lib.tneq_find_path_dp.argtypes = lib.tneq_find_path.argtypes
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None
