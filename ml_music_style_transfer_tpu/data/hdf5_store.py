"""HDF5 dataset store — the reference's 3-key schema, resizable and appendable.

Schema contract (reference preprocessing/utils/io_manager.py:39-77): datasets
``pianoroll`` (N, 860, 128), ``onoff`` (N, 860, 128), ``spec_{style}``
(N, 1025, 860), aligned so index i refers to the same musical chunk across
all keys. The reference stored float64; we default to float32 (the on-device
dtype — halves disk and load time) with a compat option.
"""
from __future__ import annotations

import h5py
import numpy as np


class H5Store:
    """Create/append resizable datasets (reference h5pyManager equivalent)."""

    def __init__(self, h5file: h5py.File, dtype: str = "float32"):
        self.data = h5file
        self.dtype = dtype

    def _append(self, key: str, arr: np.ndarray) -> None:
        if key not in self.data:
            self.data.create_dataset(
                key,
                data=arr.astype(self.dtype),
                dtype=self.dtype,
                maxshape=(None,) + arr.shape[1:],
                chunks=True,
            )
        else:
            ds = self.data[key]
            ds.resize(ds.shape[0] + arr.shape[0], axis=0)
            ds[-arr.shape[0] :] = arr.astype(self.dtype)

    def write_pianoroll(self, pianoroll_list: np.ndarray, onoff_list: np.ndarray) -> None:
        """Append aligned roll + onoff chunks (io_manager.py:46-62)."""
        self._append("pianoroll", pianoroll_list)
        self._append("onoff", onoff_list)

    def write_spectrum(self, spec_list: np.ndarray, style: str) -> None:
        """Append spectrogram chunks for one style (io_manager.py:64-76)."""
        self._append(f"spec_{style}", spec_list)

    def write_audio(self, audio_chunks: np.ndarray, style: str) -> None:
        """Append raw audio chunks for one style (device-resident training)."""
        self._append(f"audio_{style}", audio_chunks)


def load_dataset(
    path: str,
    n_read: int | None = None,
    dtype: str = "float32",
    include_audio: bool = True,
    include_specs: bool = True,
) -> dict[str, np.ndarray]:
    """Read a preprocessed HDF5 file fully into RAM (train.py:58-71 strategy).

    Returns {'pianoroll': (N,860,128), 'onoff': ..., 'spec_<style>': ...,
    optionally 'audio_<style>': ...}; styles are discovered from keys matching
    ``spec_*`` (train.py:51). ``include_audio=False`` skips the raw-audio keys
    (only the device-resident path needs them); ``include_specs=False`` skips
    the spectrogram keys (the device-resident path recomputes them on-device).
    """
    prefixes = tuple(
        p for p, on in (("spec_", include_specs), ("audio_", include_audio)) if on
    )
    out: dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        for key in f.keys():
            if key in ("pianoroll", "onoff") or key.startswith(prefixes):
                ds = f[key]
                out[key] = np.asarray(
                    ds[:n_read] if n_read is not None else ds[:], dtype=dtype
                )
    return out
