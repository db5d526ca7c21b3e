"""Native host runtime: threaded .npz prefetch loader (C++ + ctypes).

Builds ``npz_prefetch.cpp`` into ``_native.so`` on first use (g++, linked
against the system zlib) and exposes:

- :func:`available` — whether the native loader could be built/loaded.
- :func:`load_npz` — one-shot native .npz read (drop-in for ``np.load`` on
  the latent files written by :mod:`aether_tpu.train.data`).
- :class:`NpzPrefetcher` — submit paths, get dict-of-arrays back in submit
  order while worker threads read+inflate the next files. The zip walk, zlib
  inflate and npy header parse all run outside the GIL, so decode overlaps
  both Python work and device steps.

Falls back cleanly: callers must check :func:`available` (the training loader
in :mod:`aether_tpu.train.data` silently uses ``np.load`` otherwise).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "npz_prefetch.cpp")
_SO = os.path.join(_DIR, "_native.so")

_MAX_ARRAYS = 32
_MAX_DIMS = 8


class _NpzArray(ctypes.Structure):
    _fields_ = [
        ("name", ctypes.c_char * 64),
        ("dtype", ctypes.c_char * 16),
        ("ndim", ctypes.c_int64),
        ("shape", ctypes.c_int64 * _MAX_DIMS),
        ("data", ctypes.c_void_p),
        ("nbytes", ctypes.c_int64),
    ]


class _NpzBatch(ctypes.Structure):
    _fields_ = [
        ("n_arrays", ctypes.c_int64),
        ("arrays", _NpzArray * _MAX_ARRAYS),
        ("status", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
        ("path", ctypes.c_char * 1024),
    ]


_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _load_lib():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                # compile to a private temp path + atomic rename: concurrent
                # first-users must never dlopen a partially written .so
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
                     "-o", tmp, "-lz", "-pthread"],
                    check=True, capture_output=True, text=True, timeout=120,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.npzp_create.restype = ctypes.c_void_p
            lib.npzp_create.argtypes = [ctypes.c_int]
            lib.npzp_destroy.argtypes = [ctypes.c_void_p]
            lib.npzp_submit.restype = ctypes.c_long
            lib.npzp_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.npzp_wait.restype = ctypes.POINTER(_NpzBatch)
            lib.npzp_wait.argtypes = [ctypes.c_void_p]
            lib.npzp_release.argtypes = [ctypes.POINTER(_NpzBatch)]
            lib.npzp_load.restype = ctypes.POINTER(_NpzBatch)
            lib.npzp_load.argtypes = [ctypes.c_char_p]
            _lib = lib
        except Exception as exc:  # no g++ / no zlib headers / bad arch
            _build_error = f"{type(exc).__name__}: {exc}"
            _lib = None
        return _lib


def available() -> bool:
    """True when the native loader is built and loadable on this machine."""
    return _load_lib() is not None


def build_error() -> Optional[str]:
    _load_lib()
    return _build_error


def _batch_to_dict(lib, batch_ptr) -> Dict[str, np.ndarray]:
    batch = batch_ptr.contents
    try:
        if batch.status != 0:
            raise IOError(
                f"native npz load failed for {batch.path.decode()}: "
                f"{batch.error.decode()}"
            )
        out: Dict[str, np.ndarray] = {}
        for i in range(batch.n_arrays):
            arr = batch.arrays[i]
            dtype = np.dtype(arr.dtype.decode())
            shape = tuple(arr.shape[j] for j in range(arr.ndim))
            if arr.nbytes:
                view = np.ctypeslib.as_array(
                    ctypes.cast(arr.data, ctypes.POINTER(ctypes.c_uint8)),
                    shape=(arr.nbytes,),
                )
                out[arr.name.decode()] = (
                    view.view(dtype)[: arr.nbytes // dtype.itemsize]
                    .reshape(shape).copy()  # one copy; C buffer freed on release
                )
            else:
                out[arr.name.decode()] = np.zeros(shape, dtype)
        return out
    finally:
        lib.npzp_release(batch_ptr)


def load_npz(path: str) -> Dict[str, np.ndarray]:
    """Synchronous native .npz read; raises if the native lib is unavailable."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    return _batch_to_dict(lib, lib.npzp_load(os.fsencode(path)))


class NpzPrefetcher:
    """Threaded in-order .npz prefetcher.

    >>> pf = NpzPrefetcher(n_threads=2)
    >>> for p in paths: pf.submit(p)
    >>> batch = pf.get()   # dict of arrays, in submit order
    """

    def __init__(self, n_threads: int = 2):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._ctx = self._lib.npzp_create(int(n_threads))
        self._in_flight = 0

    def submit(self, path: str) -> None:
        self._lib.npzp_submit(self._ctx, os.fsencode(path))
        self._in_flight += 1

    @property
    def in_flight(self) -> int:
        return self._in_flight

    def get(self) -> Dict[str, np.ndarray]:
        if self._in_flight <= 0:
            raise RuntimeError("NpzPrefetcher.get() with nothing submitted")
        ptr = self._lib.npzp_wait(self._ctx)
        if not ptr:
            raise RuntimeError("prefetcher returned no batch")
        self._in_flight -= 1
        return _batch_to_dict(self._lib, ptr)

    def close(self) -> None:
        if getattr(self, "_ctx", None):
            self._lib.npzp_destroy(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
