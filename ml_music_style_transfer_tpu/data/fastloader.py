"""ctypes bindings for the native batch assembler (native/fastloader).

Builds libfastloader.so on first use if the native toolchain is present;
callers fall back to the pure-Python assembler when unavailable. Index and
style selection stay in Python (exact reference RNG semantics,
model/train.py:88-91); only the memcpy fan-out is native, with zero-copy
numpy views over the slot ring.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "fastloader",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastloader.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [fp, fp, ctypes.POINTER(fp), ctypes.c_int,
                              ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fl_submit.restype = ctypes.c_int
    lib.fl_submit.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(fp)] * 4
    lib.fl_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeBatchAssembler:
    """Slot-ring batch assembly over a ChunkDataset's in-RAM arrays."""

    def __init__(self, dataset, batch_size: int, n_slots: int = 3, n_threads: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libfastloader.so unavailable")
        self._lib = lib
        self.ds = dataset
        self.batch = batch_size
        t, p = dataset.pianoroll.shape[1:]
        tb, bins = dataset.specs[dataset.styles[0]].shape[1:]
        self.roll_item = t * p
        self.spec_item = tb * bins
        self._shapes = {"roll": (batch_size, t, p), "spec": (batch_size, tb, bins)}
        # keep references so numpy buffers outlive the loader
        self._arrays = [dataset.pianoroll, dataset.onoff] + [
            dataset.specs[s] for s in dataset.styles
        ]
        fp = ctypes.POINTER(ctypes.c_float)
        spec_ptrs = (fp * len(dataset.styles))(
            *[dataset.specs[s].ctypes.data_as(fp) for s in dataset.styles]
        )
        self._handle = lib.fl_create(
            dataset.pianoroll.ctypes.data_as(fp),
            dataset.onoff.ctypes.data_as(fp),
            spec_ptrs, len(dataset.styles), dataset.n_data,
            self.roll_item, self.spec_item, batch_size, n_slots, n_threads,
        )
        if not self._handle:
            raise RuntimeError("fl_create failed")

    def submit(self, idx: np.ndarray, cond_idx: np.ndarray, style: np.ndarray) -> None:
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        cond_idx = np.ascontiguousarray(cond_idx, dtype=np.int64)
        style = np.ascontiguousarray(style, dtype=np.int32)
        rc = self._lib.fl_submit(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cond_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            style.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(idx),
        )
        if rc != 0:
            raise ValueError(f"fl_submit failed: {rc}")

    def next(self) -> tuple[int, Dict[str, np.ndarray]]:
        fp = ctypes.POINTER(ctypes.c_float)
        ptrs = [fp() for _ in range(4)]
        slot = self._lib.fl_next(self._handle, *[ctypes.byref(p) for p in ptrs])
        rs, ss = self._shapes["roll"], self._shapes["spec"]

        def view(ptr, shape):
            n = int(np.prod(shape))
            return np.ctypeslib.as_array(ptr, shape=(n,)).reshape(shape)

        batch = {
            "midi": view(ptrs[0], rs),
            "onoff": view(ptrs[1], rs),
            "cond": view(ptrs[2], ss),
            "target": view(ptrs[3], ss),
            "weight": np.ones((self.batch,), np.float32),
        }
        return slot, batch

    def release(self, slot: int) -> None:
        self._lib.fl_release(self._handle, slot)

    def close(self) -> None:
        if self._handle:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- epoch iteration matching ChunkDataset.epoch_batches ------------
    def epoch_batches(self, shuffle: bool = True, pipeline_depth: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        ds, B = self.ds, self.batch
        order = ds.rng.permutation(ds.n_data) if shuffle else np.arange(ds.n_data)
        n_full = ds.n_data // B
        specs = []
        for k in range(n_full):
            idx = order[k * B : (k + 1) * B]
            specs.append((idx, ds.rng.integers(0, ds.n_data, B),
                          ds.rng.integers(0, len(ds.styles), B)))
        submitted = 0
        consumed = 0
        for k in range(min(pipeline_depth, n_full)):
            self.submit(*specs[k])
            submitted += 1
        slot = None
        try:
            for k in range(n_full):
                slot, batch = self.next()
                consumed += 1
                if submitted < n_full:
                    self.submit(*specs[submitted])
                    submitted += 1
                yield batch  # caller must finish device_put before next iteration
                self.release(slot)
                slot = None
        finally:
            # early generator exit (exception/close): return the yielded slot
            # and drain in-flight submissions so the cached assembler's slot
            # ring is intact for the next epoch
            if slot is not None:
                self.release(slot)
            while consumed < submitted:
                s, _ = self.next()
                consumed += 1
                self.release(s)
