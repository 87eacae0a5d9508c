"""In-memory chunk dataset + host-side batch assembly.

Rebuild of reference model/train.py:45-116 (Dataseth5py + Process_Data) with
the PyTorch-isms removed:
  - the whole HDF5 loads to RAM once (the reference's own fix for h5py
    per-item reads, train.py:53-57), stored float32 time-major (T, C) so
    batch assembly is pure row gathers — no per-item transposes
  - per-item randomness (style choice + random conditioning index,
    train.py:88-91 — the core "timbre from audio, content from MIDI"
    training trick) runs on the host RNG, vectorized per batch
  - batches are whole arrays ready for a single device_put, not per-item
    tensors (the reference's acknowledged bottleneck, train.py:93-96)

Batch layout is channel-last: midi/onoff (B, 860, 128), cond/target
(B, 860, 1025) — see models/performance_net.py for the layout contract.
"""
from __future__ import annotations

from typing import Dict, Iterator, List

import numpy as np

from .hdf5_store import load_dataset


class ChunkDataset:
    """All chunks of one split in RAM; samples batches with style pairing."""

    def __init__(self, path: str, n_read: int | None = None, seed: int = 42):
        raw = load_dataset(path, n_read=n_read, include_audio=False)
        self.styles: List[str] = sorted(k for k in raw if k.startswith("spec_"))
        if not self.styles:
            raise ValueError(f"no spec_* keys in {path}")
        # time-major copies: rolls already (N, 860, 128); specs stored
        # (N, 1025, 860) -> keep (N, 860, 1025) so __getitem__ is a row gather
        self.pianoroll = np.ascontiguousarray(raw["pianoroll"], dtype=np.float32)
        self.onoff = np.ascontiguousarray(raw["onoff"], dtype=np.float32)
        self.specs = {
            s: np.ascontiguousarray(raw[s].transpose(0, 2, 1), dtype=np.float32)
            for s in self.styles
        }
        self.n_data = self.pianoroll.shape[0]
        # alignment guard: a style missing for SOME songs leaves its spec_*
        # dataset shorter than the roll — indices silently point at the wrong
        # music (the reference has this failure mode, io_manager.py:41
        # contract vs preprocess.py:185-190 skip). Fail loudly instead.
        bad = {s: raw[s].shape[0] for s in self.styles if raw[s].shape[0] != self.n_data}
        if bad:
            raise ValueError(
                f"misaligned dataset {path}: pianoroll has {self.n_data} chunks "
                f"but styles {bad} differ — some songs lack those styles' audio; "
                "preprocess with a style set present for every song"
            )
        self.rng = np.random.default_rng(seed)
        self._native = {}

    def native_assembler(self, batch_size: int):
        """Cached native (C++) batch assembler for this dataset, or None.

        Uses native/fastloader's slot-ring memcpy fan-out; falls back to the
        Python path when the shared library is unavailable.
        """
        if batch_size not in self._native:
            try:
                from . import fastloader

                self._native[batch_size] = (
                    fastloader.NativeBatchAssembler(self, batch_size)
                    if fastloader.available() else None
                )
            except Exception:
                self._native[batch_size] = None
        return self._native[batch_size]

    def assemble(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Build one batch for chunk indices ``idx`` (train.py:76-101 semantics):
        per item a random style; target = that style's spec at idx; cond =
        the same style's spec at a random other index."""
        b = len(idx)
        style_ids = self.rng.integers(0, len(self.styles), b)
        cond_idx = self.rng.integers(0, self.n_data, b)
        t_bins = self.specs[self.styles[0]].shape[1:]
        cond = np.empty((b,) + t_bins, dtype=np.float32)
        target = np.empty((b,) + t_bins, dtype=np.float32)
        for j in range(b):
            spec = self.specs[self.styles[style_ids[j]]]
            target[j] = spec[idx[j]]
            cond[j] = spec[cond_idx[j]]
        return {
            "midi": self.pianoroll[idx],
            "onoff": self.onoff[idx],
            "cond": cond,
            "target": target,
        }

    def epoch_batches(
        self, batch_size: int, shuffle: bool = True, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate one epoch of batches (DataLoader equivalent, train.py:114).

        Static batch shapes for XLA: with drop_last=False the final partial
        batch is padded to batch_size and carries a 'weight' mask (per-item
        1/0) so masked losses stay exact.
        """
        order = self.rng.permutation(self.n_data) if shuffle else np.arange(self.n_data)
        for s in range(0, self.n_data, batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    return
                pad = np.zeros(batch_size - len(idx), dtype=idx.dtype)
                weight = np.concatenate(
                    [np.ones(len(idx), np.float32), np.zeros(len(pad), np.float32)]
                )
                idx = np.concatenate([idx, pad])
                batch = self.assemble(idx)
                batch["weight"] = weight
                yield batch
            else:
                batch = self.assemble(idx)
                batch["weight"] = np.ones(batch_size, np.float32)
                yield batch

    def batches_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        if drop_last:
            return self.n_data // batch_size
        return -(-self.n_data // batch_size)


def process_data(
    data_dir: str,
    n_train_read: int | None = None,
    n_test_read: int | None = None,
    seed: int = 42,
) -> tuple["ChunkDataset", "ChunkDataset"]:
    """Load the train/test splits (reference Process_Data, train.py:107-116)."""
    train = ChunkDataset(data_dir + "_train.hdf5", n_read=n_train_read, seed=seed)
    test = ChunkDataset(data_dir + "_test.hdf5", n_read=n_test_read, seed=seed + 1)
    return train, test
