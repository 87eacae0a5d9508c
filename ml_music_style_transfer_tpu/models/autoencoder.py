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
from typing import Any, NamedTuple

import jax
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


class AutoencoderTrainer(NamedTuple):
    """Handles from make_autoencoder_train_step."""
    step: Any        # jitted (params, opt, spec, weight) -> (params, opt, loss)
    tx: Any          # optax transform (tx.init(params) builds the opt state)
    mel_encode: Any  # jitted (B,T,1+n_fft//2) log-power -> (B,T,n_bins) log1p mel
    loss_fn: Any     # jitted (params, mel, weight) -> scalar spectral loss


def make_autoencoder_train_step(cfg: AutoencoderConfig, sr: int = 44100,
                                n_fft: int = 2048,
                                learning_rate: float = 1e-3,
                                band_scales: tuple = (1, 2, 4)):
    """Spectral-loss train step on MEL frames — this family's stated
    contract (module docstring / BASELINE config 3).

    The training data is the pipeline's raw log-power STFT frames
    (B, T, 1 + n_fft//2). On device: invert the log compression, project
    power onto ``cfg.n_bins`` mel bands (ops/mel.py — one MXU matmul),
    re-compress with log1p; the autoencoder reconstructs these mel frames
    and minimizes the multi-scale spectral distance
    (train/losses.py:mel_multiscale_spectral_loss) between reconstruction
    and mel target at band resolutions n_bins/k for k in ``band_scales``.

    Returns an AutoencoderTrainer; ``step`` donates (params, opt_state).
    """
    import optax

    from ..ops import mel as jmel
    from ..train import losses

    model = SpectrogramAutoencoder(cfg)
    tx = optax.adam(learning_rate)

    def mel_encode(spec_log_power):
        fb = jmel.mel_filterbank(sr, n_fft, cfg.n_bins)
        power = jnp.expm1(spec_log_power)  # invert ops/stft log1p(|.|^2)
        mel = jnp.einsum("mf,btf->btm", fb, power,
                         preferred_element_type=jnp.float32)
        return jnp.log1p(mel)

    def loss_fn(params, mel, weight):
        recon = model.apply(params, mel)
        return losses.mel_multiscale_spectral_loss(
            recon, mel, weight, band_scales=band_scales)

    def step(params, opt_state, spec_log_power, weight):
        mel = mel_encode(spec_log_power)
        loss, grads = jax.value_and_grad(loss_fn)(params, mel, weight)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return AutoencoderTrainer(
        step=jax.jit(step, donate_argnums=(0, 1)),
        tx=tx,
        mel_encode=jax.jit(mel_encode),
        loss_fn=jax.jit(loss_fn),
    )
