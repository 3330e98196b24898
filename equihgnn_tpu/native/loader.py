"""Lazy g++ build + ctypes binding for the native packer.

The shared library is always compiled locally, into a per-machine cache
directory keyed by the SHA-256 of the source — never committed to git and
never reused across source changes or machines (a stale/foreign binary built
with -march=native elsewhere could SIGILL)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "packer.cpp")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "equihgnn_tpu")


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_cache_dir(), f"packer-{digest}.so")


def _build() -> str | None:
    try:
        so = _so_path()
        if os.path.exists(so):
            return so
        os.makedirs(os.path.dirname(so), exist_ok=True)
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)
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
