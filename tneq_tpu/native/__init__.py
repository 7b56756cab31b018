"""Native (C++) runtime components, loaded via ctypes.

Builds on first use with g++ (no pybind11 in this image); artifacts are
cached next to the source.  Falls back gracefully when no compiler exists.
"""

from .build import load_library, native_available
from .path import find_path, path_cost

__all__ = ["load_library", "native_available", "find_path", "path_cost"]
