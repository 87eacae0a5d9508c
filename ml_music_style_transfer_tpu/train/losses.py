"""Loss functions (jittable, batch-mask aware).

Reference contract: L1 train loss (model/train.py:132), MSE eval loss
(train.py:158). The optional DDSP-style multi-scale spectral loss is the
reference's stated intent (train.py:119-123 engel_loss sketch;
README.md:22-23), implemented here over mel projections of the predicted /
target spectrograms at several resolutions.

All losses take a per-item ``weight`` (B,) mask so padded eval batches stay
exact; reductions are means over the weighted elements, matching torch's
default 'mean' reduction when all weights are 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import mel as jmel
from ..ops import stft as jstft


def _weighted_mean(per_item: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """per_item (B,) of per-item means -> scalar weighted mean."""
    return jnp.sum(per_item * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """nn.L1Loss() equivalent (train.py:132)."""
    per_item = jnp.mean(jnp.abs(pred - target), axis=tuple(range(1, pred.ndim)))
    return _weighted_mean(per_item, weight)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """nn.MSELoss() equivalent (train.py:158)."""
    per_item = jnp.mean((pred - target) ** 2, axis=tuple(range(1, pred.ndim)))
    return _weighted_mean(per_item, weight)


def multiscale_spectral_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    mel_scales: tuple = (512, 256, 128, 64),
    log_alpha: float = 1.0,
) -> jnp.ndarray:
    """Multi-resolution spectral distance on (B, T, bins) log-power specs.

    Inverts the log1p(|.|^2) compression to linear magnitude, projects power
    onto mel banks at several resolutions, and sums L1(linear) +
    log_alpha * L1(log) per scale — the Engel et al. (DDSP,
    arXiv:2001.04643) recipe adapted to spectrogram-output models.
    """
    mag_p = jstft.inverse_log_power(pred)
    mag_t = jstft.inverse_log_power(target)
    pow_p = jnp.swapaxes(mag_p**2, -1, -2)  # (B, bins, T)
    pow_t = jnp.swapaxes(mag_t**2, -1, -2)
    total = 0.0
    for n_mels in mel_scales:
        mp = jmel.melspectrogram_from_power(pow_p, sr, n_fft, n_mels)
        mt = jmel.melspectrogram_from_power(pow_t, sr, n_fft, n_mels)
        lin = jnp.mean(jnp.abs(mp - mt), axis=(1, 2))
        log = jnp.mean(jnp.abs(jnp.log1p(mp) - jnp.log1p(mt)), axis=(1, 2))
        total = total + _weighted_mean(lin + log_alpha * log, weight)
    return total / len(mel_scales)
