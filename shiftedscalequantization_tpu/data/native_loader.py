"""ctypes bindings for the native (C++) data pipeline.

Builds/loads native/libssq_native.so: threaded double-buffered batch
producer with normalization and deterministic shard-aware shuffling.
Falls back to the pure-python ArrayLoader when the toolchain is absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libssq_native.so")
_lib = None


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        src = os.path.join(_NATIVE_DIR, "dataloader.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    i64, p = ctypes.c_int64, ctypes.c_void_p
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ssq_loader_create_u8.restype = p
    lib.ssq_loader_create_u8.argtypes = [
        u8p, i32p, i64, i64, i64, i64, f32p, f32p, i64, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.ssq_loader_create_f32.restype = p
    lib.ssq_loader_create_f32.argtypes = [
        f32p, i32p, i64, i64, i64, i64, i64, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ssq_loader_num_batches.restype = i64
    lib.ssq_loader_num_batches.argtypes = [p]
    lib.ssq_loader_next.restype = i64
    lib.ssq_loader_next.argtypes = [p, f32p, i32p]
    lib.ssq_loader_destroy.argtypes = [p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _ensure_built() is not None


class NativeLoader:
    """Iterable of (images NHWC float32, labels int32) batches produced by
    the C++ pipeline. Keeps the source arrays alive for the loader's
    lifetime (the native side reads them zero-copy)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = False, seed: int = 0,
                 shard=(0, 1), drop_last: bool = False,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None, prefetch: int = 2):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native loader unavailable (no toolchain)")
        self._lib = lib
        n, h, w, c = images.shape
        self._shape = (h, w, c)
        self.batch_size = batch_size
        self._labels = np.ascontiguousarray(labels, np.int32)
        self._rank, self._world = shard
        self._shuffle, self._seed = shuffle, seed
        self._drop_last, self._prefetch = drop_last, prefetch
        self._u8 = images.dtype == np.uint8
        if self._u8:
            self._images = np.ascontiguousarray(images)
            self._mean = np.ascontiguousarray(
                mean if mean is not None else np.zeros(c), np.float32)
            self._std = np.ascontiguousarray(
                std if std is not None else np.ones(c), np.float32)
        else:
            self._images = np.ascontiguousarray(images, np.float32)
        self._epoch = 0

    def _make(self):
        """Fresh native handle (the producer is single-epoch); shuffle seed
        advances per epoch for training-style feeds."""
        lib = self._lib
        n = self._images.shape[0]
        h, w, c = self._shape
        i32p = self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        seed = self._seed + (self._epoch if self._shuffle else 0)
        if self._u8:
            return lib.ssq_loader_create_u8(
                self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                i32p, n, h, w, c,
                self._mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.batch_size, int(self._shuffle), seed, self._rank,
                self._world, int(self._drop_last), self._prefetch)
        return lib.ssq_loader_create_f32(
            self._images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            i32p, n, h, w, c, self.batch_size, int(self._shuffle), seed,
            self._rank, self._world, int(self._drop_last), self._prefetch)

    def __len__(self):
        handle = self._make()
        try:
            return self._lib.ssq_loader_num_batches(handle)
        finally:
            self._lib.ssq_loader_destroy(handle)

    def __iter__(self):
        h, w, c = self._shape
        handle = self._make()
        self._epoch += 1
        try:
            while True:
                imgs = np.empty((self.batch_size, h, w, c), np.float32)
                labs = np.empty((self.batch_size,), np.int32)
                got = self._lib.ssq_loader_next(
                    handle,
                    imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                if got == 0:
                    return
                yield imgs[:got], labs[:got]
        finally:
            self._lib.ssq_loader_destroy(handle)
