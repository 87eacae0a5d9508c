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


@functools.lru_cache(maxsize=None)
def _dct_const(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — scipy.fft.dct(norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


def mfcc_from_power(
    power_spec: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    n_mfcc: int = 20,
    n_mels: int = 128,
) -> jnp.ndarray:
    """(..., bins, frames) power spec -> (..., n_mfcc, frames) MFCCs.

    librosa.feature.mfcc semantics (the reference's other considered
    representation, preprocess.py:56): dB-scaled mel spectrogram then
    orthonormal DCT-II over the mel axis.
    """
    mel = melspectrogram_from_power(power_spec, sr, n_fft, n_mels)
    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel, axis=(-2, -1), keepdims=True) - 80.0)
    dct = jnp.asarray(_dct_const(n_mfcc, n_mels))
    return jnp.einsum("km,...mt->...kt", dct, log_mel, preferred_element_type=jnp.float32)
