"""Native runtime: ctypes bindings for the C++ data loader.

Builds loader.cc on demand with the system g++ (pybind11 is not in this
image; the C ABI + ctypes keeps the binding dependency-free). The compiled
.so is cached next to the source, keyed by a source hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    so = os.path.join(_DIR, f"_loader_{tag}.so")
    if not os.path.exists(so):
        tmp = so + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_lib())
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64]
        lib.loader_start_epoch.restype = ctypes.c_int
        lib.loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_int]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_channels.restype = ctypes.c_int
        lib.loader_channels.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeTrainLoader:
    """Drop-in replacement for data.pipeline.TrainLoader backed by the C++
    thread pool. Same iteration contract: yields (lr, hr) float32 NHWC
    batches; deterministic per (seed, epoch). Requires a uint8 npy cache
    (the colors==3 path; the float64 ycbcr cache falls back to Python)."""

    def __init__(self, hr_npy, lr_npy, *, patch_size: int, scale: int,
                 batch_size: int, repeat: int = 5, num_workers: int = 8,
                 seed: int = 33):
        lib = get_lib()
        n = len(hr_npy)
        hr_arr = (ctypes.c_char_p * n)(*[p.encode() for p in hr_npy])
        lr_arr = (ctypes.c_char_p * n)(*[p.encode() for p in lr_npy])
        self._handle = lib.loader_create(
            hr_arr, lr_arr, n, patch_size, scale, batch_size, num_workers,
            seed)
        if not self._handle:
            raise RuntimeError(
                "native loader rejected the npy cache (only uint8 C-order "
                "arrays are supported)")
        self._lib = lib
        self.patch = patch_size
        self.scale = scale
        self.batch = batch_size
        self.repeat = repeat
        self.channels = lib.loader_channels(self._handle)
        self.epoch = 0
        self.n_images = n

    def __len__(self) -> int:
        return self.n_images * self.repeat // self.batch

    def __iter__(self):
        steps = self._lib.loader_start_epoch(self._handle, self.epoch,
                                             self.repeat)
        self.epoch += 1
        lp = self.patch // self.scale
        for b in range(steps):
            lr = np.empty((self.batch, lp, lp, self.channels), np.float32)
            hr = np.empty((self.batch, self.patch, self.patch,
                           self.channels), np.float32)
            rc = self._lib.loader_next(
                self._handle, b,
                lr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                hr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc == -2:
                raise RuntimeError("native loader timed out producing a "
                                   "batch (worker failure?)")
            if rc != 0:
                raise RuntimeError("native loader aborted")
            yield lr, hr

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None
