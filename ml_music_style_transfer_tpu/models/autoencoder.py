"""Compact conv spectrogram autoencoder — the small ablation model family.

BASELINE config 3 calls for a "small conv spectrogram autoencoder,
spectral-loss train step on mel frames (single chip)": a fast-iterating
stand-in for PerformanceNet when prototyping losses/DSP. Same I/O layout
conventions as the flagship (channel-last (B, T, bins)), built from the same
blocks (models/layers.py), so train-step plumbing is interchangeable.

Architecture: 3 DownConvs (pool x2) -> bottleneck conv -> 2 torch-semantics
ConvTranspose upsamples -> linear head back to the input bins.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvTranspose1dTorch, DownConv, Conv1x3, instance_norm, leaky_relu


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    n_bins: int = 1025          # input/output spectrogram bins (or n_mels)
    width: int = 256            # base channel count
    compute_dtype: str = "bfloat16"


class SpectrogramAutoencoder(nn.Module):
    """(B, T, bins) -> (B, T, bins); T must be divisible by 4."""

    cfg: AutoencoderConfig = AutoencoderConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        w = cfg.width
        h, _ = DownConv(w, pooling=True, compute_dtype=dtype, name="down_0")(x)
        h, _ = DownConv(2 * w, pooling=True, compute_dtype=dtype, name="down_1")(h)
        h, _ = DownConv(4 * w, pooling=False, compute_dtype=dtype, name="bottleneck")(h)
        # (T-1)*2 - 2 + 4 = 2T: exact 2x upsample with the k=4,s=2,p=1 plan
        h = leaky_relu(instance_norm(ConvTranspose1dTorch(2 * w, 4, 2, 1, dtype, name="up_0")(h)))
        h = leaky_relu(instance_norm(ConvTranspose1dTorch(w, 4, 2, 1, dtype, name="up_1")(h)))
        h = Conv1x3(cfg.n_bins, dtype, name="head")(h)
        return nn.relu(h).astype(jnp.float32)
