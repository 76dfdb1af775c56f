"""ctypes bindings for the native real-time transport (native/ringbuffer.cpp).

Builds on first use if g++ is available; a pure-numpy fallback keeps the
package importable without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsvan_rt.so"))
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.svan_ring_create.restype = ctypes.c_void_p
        lib.svan_ring_create.argtypes = [ctypes.c_uint64]
        for name in ("destroy",):
            getattr(lib, f"svan_ring_{name}").argtypes = [ctypes.c_void_p]
        for name in ("capacity", "available", "space", "overruns", "underruns"):
            fn = getattr(lib, f"svan_ring_{name}")
            fn.restype = ctypes.c_uint64
            fn.argtypes = [ctypes.c_void_p]
        for name in ("write", "read", "peek"):
            fn = getattr(lib, f"svan_ring_{name}")
            fn.restype = ctypes.c_uint64
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_uint64,
            ]
        _lib = lib
        return lib


class RingBuffer:
    """Wait-free SPSC float ring (native when available)."""

    def __init__(self, min_capacity: int):
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.svan_ring_create(min_capacity)
            if not self._h:
                raise MemoryError("svan_ring_create failed")
        else:  # numpy fallback (NOT wait-free; fine for tests/offline)
            self._buf = np.zeros(0, np.float32)
            self._over = 0
            self._under = 0
            self._cap = 1 << (min_capacity - 1).bit_length()

    @property
    def native(self) -> bool:
        return self._lib is not None

    def write(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, np.float32)
        if self._lib is not None:
            return int(
                self._lib.svan_ring_write(
                    self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(x),
                )
            )
        self._buf = np.concatenate([self._buf, x])
        if len(self._buf) > self._cap:
            self._over += len(self._buf) - self._cap
            self._buf = self._buf[-self._cap:]
        return len(x)

    def read(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.float32)
        if self._lib is not None:
            self._lib.svan_ring_read(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
            )
            return out
        take = min(n, len(self._buf))
        out[:take] = self._buf[:take]
        if take < n:
            self._under += n - take
        self._buf = self._buf[take:]
        return out

    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.svan_ring_available(self._h))
        return len(self._buf)

    def overruns(self) -> int:
        if self._lib is not None:
            return int(self._lib.svan_ring_overruns(self._h))
        return self._over

    def underruns(self) -> int:
        if self._lib is not None:
            return int(self._lib.svan_ring_underruns(self._h))
        return self._under

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.svan_ring_destroy(self._h)
            self._h = None
