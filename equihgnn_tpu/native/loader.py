"""Lazy g++ build + ctypes binding for the native packer."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "packer.cpp")


def _so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_packer.so")


def _build() -> str | None:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", so + ".tmp"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(so + ".tmp", so)
        return so
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        print(f"[equihgnn_tpu.native] packer build failed ({e}); using Python fallback")
        return None


def get_packer_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.pack_hypergraph_batch.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_packer_lib() is not None
