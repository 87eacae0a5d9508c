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
    clip_max: float = 20.0,
    mode: str = "linlog",
) -> jnp.ndarray:
    """Multi-resolution spectral distance on (B, T, bins) log-power specs.

    Inverts the log1p(|.|^2) compression to linear magnitude, projects power
    onto mel banks at several resolutions, and sums L1(linear) +
    log_alpha * L1(log) per scale — the Engel et al. (DDSP,
    arXiv:2001.04643) recipe adapted to spectrogram-output models.

    ``mode`` selects the round-5 ablation variants (round-4 verdict missing
    #3: the w ∈ {0.01, 0.1} sweep failed with the linear+log sum, and its
    own autopsy blamed the linear-power mel terms being dominated by the
    loudest bins — the direct ablation was never run):
      - "linlog" (default): L1(linear mel power) + log_alpha * L1(log mel),
        the original sweep's configuration;
      - "log": the log-mel term ONLY (linear term dropped) — the autopsy's
        named ablation;
      - "direct": NO inversion at all — multi-scale L1 between the models'
        own log1p outputs, mel-banked in the log domain. Cheapest and
        closest to the training target's own metric.

    Numerical-safety contract (both bit the round-4 TPU gate at lr=1e-3,
    weight=0.1):
      - inputs are clipped to [0, clip_max] BEFORE inversion — the DSP
        contract clips log-power there (ops/stft.log_power_stft), and an
        early-training prediction spike past ~88 overflows expm1 in f32;
      - the power spectrogram is expm1(x) DIRECTLY, never
        sqrt(expm1(x))**2: sqrt'(0) = inf, the model's output has many
        elements <= 0 (leaky-ReLU negatives land on the clip floor), and
        their downstream cotangent is exactly 0 there, so the chain
        produced 0 * inf = NaN in the gradient on the very first step
        while the LOSS VALUE stayed finite.
    """
    if mode not in ("linlog", "log", "direct"):
        raise ValueError(f"spectral loss mode must be 'linlog', 'log' or "
                         f"'direct', got {mode!r}")
    if mode == "direct":
        # log-domain throughout: mel-bank the log1p outputs themselves.
        # The banks are a fixed nonnegative projection, so this is a pure
        # multi-resolution smoothing of the training target's own domain —
        # no expm1, no loud-bin domination, no overflow risk.
        lp = jnp.swapaxes(jnp.clip(pred, 0.0, clip_max), -1, -2)
        lt = jnp.swapaxes(jnp.clip(target, 0.0, clip_max), -1, -2)
        total = 0.0
        for n_mels in mel_scales:
            mp = jmel.melspectrogram_from_power(lp, sr, n_fft, n_mels)
            mt = jmel.melspectrogram_from_power(lt, sr, n_fft, n_mels)
            total = total + _weighted_mean(
                jnp.mean(jnp.abs(mp - mt), axis=(1, 2)), weight)
        return total / len(mel_scales)
    pow_p = jnp.swapaxes(jnp.expm1(jnp.clip(pred, 0.0, clip_max)), -1, -2)
    pow_t = jnp.swapaxes(jnp.expm1(jnp.clip(target, 0.0, clip_max)), -1, -2)
    total = 0.0
    for n_mels in mel_scales:
        mp = jmel.melspectrogram_from_power(pow_p, sr, n_fft, n_mels)
        mt = jmel.melspectrogram_from_power(pow_t, sr, n_fft, n_mels)
        log = jnp.mean(jnp.abs(jnp.log1p(mp) - jnp.log1p(mt)), axis=(1, 2))
        if mode == "log":
            per_scale = log_alpha * log
        else:
            lin = jnp.mean(jnp.abs(mp - mt), axis=(1, 2))
            per_scale = lin + log_alpha * log
        total = total + _weighted_mean(per_scale, weight)
    return total / len(mel_scales)


def mel_multiscale_spectral_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    band_scales: tuple = (1, 2, 4),
    log_alpha: float = 1.0,
) -> jnp.ndarray:
    """Multi-resolution spectral distance for models whose OUTPUT domain is
    already mel: (B, T, n_mels) log1p(mel power) frames.

    The multiscale_spectral_loss above projects linear-frequency outputs
    (the flagship's 1025 bins) onto mel banks of several sizes; when the
    model reconstructs mel frames directly (the autoencoder family,
    models/autoencoder.py — BASELINE config 3), the resolutions come from
    adjacent-band mean pooling instead: for each k in ``band_scales``, the
    n_mels bands are pooled to n_mels/k and L1(linear power) +
    log_alpha * L1(log power) accumulated — the same Engel et al. (DDSP,
    arXiv:2001.04643) recipe in the model's own domain.
    """
    pow_p = jnp.expm1(pred)
    pow_t = jnp.expm1(target)
    n_mels = pred.shape[-1]
    total = 0.0
    for k in band_scales:
        if n_mels % k:
            raise ValueError(f"n_mels={n_mels} not divisible by band scale {k}")
        pp = pow_p.reshape(*pow_p.shape[:-1], n_mels // k, k).mean(-1)
        pt = pow_t.reshape(*pow_t.shape[:-1], n_mels // k, k).mean(-1)
        lin = jnp.mean(jnp.abs(pp - pt), axis=(1, 2))
        log = jnp.mean(jnp.abs(jnp.log1p(pp) - jnp.log1p(pt)), axis=(1, 2))
        total = total + _weighted_mean(lin + log_alpha * log, weight)
    return total / len(band_scales)
