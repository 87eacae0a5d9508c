"""Mel-scale ops (JAX / XLA).

The reference considered mel spectrograms (preprocessing/preprocess.py:55-56,
commented alternatives) and BASELINE's metric is phrased in mel-frames; the
DDSP-style multi-scale spectral loss (reference intent, model/train.py:119-123)
uses mel projections at several resolutions. The filterbank is a static
constant; application is a single (bins x mels) matmul that rides the MXU.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import reference as npref


@functools.lru_cache(maxsize=None)
def _mel_fb_const(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float | None) -> np.ndarray:
    return npref.mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float32)


def mel_filterbank(
    sr: int = 44100,
    n_fft: int = 2048,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """Slaney-normalized mel filterbank, (n_mels, 1 + n_fft//2)."""
    return jnp.asarray(_mel_fb_const(sr, n_fft, n_mels, fmin, fmax))


def melspectrogram_from_power(
    power_spec: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """(..., bins, frames) power spectrogram -> (..., n_mels, frames).

    Equivalent to librosa.feature.melspectrogram given |STFT|^2 input
    (the alternative at reference preprocess.py:55).
    """
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    return jnp.einsum(
        "mf,...ft->...mt", fb, power_spec, preferred_element_type=jnp.float32
    )
