"""Native (C++) runtime components, loaded via ctypes.

Build happens lazily on first use with g++ (no pybind11 required); the pure
Python implementations remain as a fallback so the framework works on systems
without a compiler.
"""

from equihgnn_tpu.native.loader import get_packer_lib, native_available  # noqa: F401
