"""ctypes bindings for the native resident-id map (idmap.cpp).

The shared library builds lazily on first use (g++ -O3 -shared) and is cached
next to the source. Falls back gracefully: callers check
`native_available()` and use a pure-Python dict otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "idmap.cpp")
_LIB = os.path.join(_HERE, "libquake_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.idmap_create.restype = ctypes.c_void_p
        lib.idmap_create.argtypes = [ctypes.c_int64]
        lib.idmap_destroy.argtypes = [ctypes.c_void_p]
        lib.idmap_size.restype = ctypes.c_int64
        lib.idmap_size.argtypes = [ctypes.c_void_p]
        lib.idmap_set_batch.restype = ctypes.c_int64
        lib.idmap_set_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.idmap_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.idmap_contains_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.idmap_erase_batch.restype = ctypes.c_int64
        lib.idmap_erase_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.idmap_items.restype = ctypes.c_int64
        lib.idmap_items.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.idmap_rows_of.restype = ctypes.c_int64
        lib.idmap_rows_of.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeIdMap:
    """int64 id -> int32 partition row, batch-oriented."""

    def __init__(self, initial_capacity: int = 1024):
        lib = _load()
        if lib is None:
            raise RuntimeError("native idmap unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.idmap_create(int(initial_capacity))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.idmap_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def __len__(self) -> int:
        return int(self._lib.idmap_size(self._h))

    def set_batch(self, keys: np.ndarray, values: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        values = np.ascontiguousarray(values, dtype=np.int32)
        return int(self._lib.idmap_set_batch(self._h, _ptr(keys), _ptr(values), len(keys)))

    def get_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(len(keys), dtype=np.int32)
        self._lib.idmap_get_batch(self._h, _ptr(keys), _ptr(out), len(keys))
        return out

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(len(keys), dtype=np.uint8)
        self._lib.idmap_contains_batch(self._h, _ptr(keys), _ptr(out), len(keys))
        return out.astype(bool)

    def erase_batch(self, keys: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        return int(self._lib.idmap_erase_batch(self._h, _ptr(keys), len(keys)))

    def items(self):
        n = len(self)
        keys = np.empty(n, dtype=np.int64)
        values = np.empty(n, dtype=np.int32)
        written = self._lib.idmap_items(self._h, _ptr(keys), _ptr(values))
        return keys[:written], values[:written]

    def rows_of(self, keys: np.ndarray) -> np.ndarray:
        """Distinct partition rows containing any of the given ids."""
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(max(len(keys), 1), dtype=np.int32)
        n = self._lib.idmap_rows_of(self._h, _ptr(keys), len(keys), _ptr(out))
        return out[:n]
