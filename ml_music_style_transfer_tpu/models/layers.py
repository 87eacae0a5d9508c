"""PerformanceNet building blocks (Flax linen, TPU layout).

Rebuilds the blocks of reference model/model.py:14-174 with TPU-first
choices:
  - activations are channel-LAST (B, T, C): C (128..6144, mostly multiples of
    128) rides the TPU lane dimension, so convs lower to MXU-friendly GEMMs
  - InstanceNorm1d is a stateless normalization over time per (batch,
    channel) — torch's no-affine, no-running-stats configuration
    (model.py:42-44), identical in train and eval
  - transposed convs reproduce torch ConvTranspose1d length semantics
    out = (T-1)*stride - 2*pad + kernel exactly via lhs_dilation
  - params are float32; conv/dense compute can run in bfloat16
    (normalizations stay float32)

The reference applies ``conv1_BN`` after both convs in DownConv
(model.py:48-49, quirk); since InstanceNorm here is stateless/parameter-free,
one normalization function serves both call sites — no behavioral divergence.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier = nn.initializers.xavier_normal()


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over the time axis of (B, T, C), float32 statistics.

    Equivalent to torch.nn.InstanceNorm1d(C) with affine=False,
    track_running_stats=False (reference model.py:42,44,65,67,69).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-2, keepdims=True)
    var = jnp.var(x32, axis=-2, keepdims=True)
    # statistics in float32, output back in the compute dtype: activations
    # stay bf16 end-to-end (halves HBM traffic between conv blocks)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def leaky_relu(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    """LeakyReLU(0.01) (reference model.py:40)."""
    return nn.leaky_relu(x, negative_slope=slope)


def fast_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """Dropout via the TPU hardware-PRNG Pallas kernel when on a single-chip
    TPU, else the standard threefry path.

    XLA's threefry mask generation measured ~14 ms/step at batch 64 (the
    largest non-matmul cost in the profiled train step, BASELINE.md); the
    pallas kernel (ops/pallas/dropout.py) emits the mask at HBM-write speed.
    Draws differ between the two paths (different PRNG), both honor the rate.
    Multi-device programs keep the threefry path: a pallas_call on an
    activation sharded over the mesh's model axis has no GSPMD partitioning
    rule, so XLA would insert an all-gather around it (or reject it) —
    strictly worse than the mask chain it replaces.
    """
    from ..ops import pallas as pk

    if pk.on_tpu() and len(jax.devices()) == 1:
        seed = jax.random.randint(key, (), -(2**31), 2**31 - 1, dtype=jnp.int32)
        return x * pk.dropout.dropout_mask(seed, x.shape, rate, dtype=x.dtype)
    return pk.dropout.dropout_reference(x, key, rate)


def crop_and_concat(upsampled: jnp.ndarray, bypass: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat after reconciling time lengths (reference model.py:71-78).

    Center-crops (or pads) ``bypass`` to the upsampled length using the
    reference's exact negative-F.pad arithmetic, then right-crops any
    leftover odd frame. Shapes are static under jit, so this is pure Python
    shape math.
    """
    t_up = upsampled.shape[-2]
    t_by = bypass.shape[-2]
    c = (t_by - t_up) // 2  # python floor division, as in the reference
    if c > 0:
        bypass = bypass[..., c : t_by - c, :]
    elif c < 0:
        bypass = jnp.pad(bypass, [(0, 0)] * (bypass.ndim - 2) + [(-c, -c), (0, 0)])
    t_now = bypass.shape[-2]
    if t_now > t_up:
        bypass = bypass[..., :t_up, :]
    elif t_now < t_up:  # cannot occur with floor division; keep the guard
        bypass = jnp.pad(bypass, [(0, 0)] * (bypass.ndim - 2) + [(0, t_up - t_now), (0, 0)])
    return jnp.concatenate([upsampled, bypass], axis=-1)


class Conv1x3(nn.Module):
    """k=3, s=1, p=1 conv (reference conv1x3, model.py:14-22), xavier/zero init."""

    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(3,),
            padding=[(1, 1)],
            kernel_init=xavier,
            bias_init=nn.initializers.zeros,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvTranspose1dTorch(nn.Module):
    """torch.nn.ConvTranspose1d(kernel, stride, padding) semantics.

    Output length (T-1)*stride - 2*padding + kernel (used for the decoder's
    53->108->216->431->860 ladder, reference model.py:24-31, 229-233).
    Implemented as an input-dilated conv with a flipped kernel.
    """

    features: int
    kernel: int
    stride: int = 2
    padding: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", xavier, (self.kernel, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = self.kernel - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            jnp.flip(kernel, 0).astype(self.compute_dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias.astype(y.dtype)


class DownConv(nn.Module):
    """(conv1x3 -> IN -> LeakyReLU) x2, optional MaxPool(2) (model.py:34-53).

    Returns (pooled, before_pool) for U-Net skips.
    """

    features: int
    pooling: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    slope: float = 0.01
    eps: float = 1e-5
    # optional TP activation constraint (parallel/mesh.py:activation_constrainer):
    # keeps the (wide) conv outputs channel-sharded on the model axis
    constrain: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        c = self.constrain or (lambda v: v)
        x = c(leaky_relu(instance_norm(Conv1x3(self.features, self.compute_dtype)(x), self.eps), self.slope))
        x = c(leaky_relu(instance_norm(Conv1x3(self.features, self.compute_dtype)(x), self.eps), self.slope))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        return x, before_pool


class UpConv(nn.Module):
    """Decoder block (model.py:56-90): transposed-conv upsample -> IN -> LReLU,
    skip fuse (crop_and_concat + conv), optional onset-condition fuse + conv."""

    features: int
    upconv_kernel: int = 2
    has_condition: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    slope: float = 0.01
    eps: float = 1e-5

    @nn.compact
    def __call__(self, skip, dec, cond: Optional[jnp.ndarray] = None):
        x = leaky_relu(
            instance_norm(
                ConvTranspose1dTorch(
                    self.features, self.upconv_kernel, 2, 1, self.compute_dtype
                )(dec),
                self.eps,
            ),
            self.slope,
        )
        x = crop_and_concat(x, skip)
        x = leaky_relu(instance_norm(Conv1x3(self.features, self.compute_dtype)(x), self.eps), self.slope)
        if self.has_condition:
            x = crop_and_concat(x, cond)
        x = Conv1x3(self.features, self.compute_dtype)(x)
        return leaky_relu(instance_norm(x, self.eps), self.slope)


class DenseConcat(nn.Module):
    """Latent fusion of MIDI/audio branches (model.py:93-108).

    Channel-concat then two Linear+ReLU+Dropout(0.2) over the channel dim.
    In channel-last layout no transposes are needed (the reference transposes
    only because its tensors are channel-first).
    """

    intermediate: int
    features: int
    dropout_rate: float = 0.2
    compute_dtype: jnp.dtype = jnp.bfloat16
    # optional TP activation constraint: pins the fc1 hidden (the widest
    # activation in the model, up to 1.5*4096 ch) to the model axis —
    # Megatron column-parallel fc1 / row-parallel fc2 then never gather it
    constrain: Optional[Callable] = None

    @nn.compact
    def __call__(self, midi_embed, audio_embed, deterministic: bool = True):
        x = jnp.concatenate(
            [audio_embed.astype(self.compute_dtype), midi_embed.astype(self.compute_dtype)],
            axis=-1,
        )
        x = nn.relu(nn.Dense(self.intermediate, dtype=self.compute_dtype, param_dtype=jnp.float32)(x))
        if self.constrain is not None:
            x = self.constrain(x)
        x = self._dropout(x, deterministic)
        x = nn.relu(nn.Dense(self.features, dtype=self.compute_dtype, param_dtype=jnp.float32)(x))
        return self._dropout(x, deterministic)

    def _dropout(self, x, deterministic: bool):
        if deterministic or self.dropout_rate == 0.0:
            return x
        return fast_dropout(x, self.make_rng("dropout"), self.dropout_rate)


class MBRBlock(nn.Module):
    """Multi-band residual block (model.py:143-174).

    Splits channels into ``num_bands`` bands; each band runs
    conv-IN-LReLU-conv-IN. Two behaviors:
      - compat_noop=False (default): the *intended* residual
        ``x + concat(band_branches)``
      - compat_noop=True: the reference's literal behavior — ``torch.add``'s
        result is discarded (model.py:172) and line 173 computes
        x + concat(unchanged bands) == 2*x, so the block just doubles
        activations and its conv params receive no gradient. Reproduced (as
        2*x, without the dead convs) for output parity with trained
        reference checkpoints.
    """

    num_bands: int
    compat_noop: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    slope: float = 0.01
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        if self.compat_noop:
            return x * 2.0
        in_ch = x.shape[-1]
        assert in_ch % self.num_bands == 0, (in_ch, self.num_bands)
        band_dim = in_ch // self.num_bands
        bands = jnp.split(x, self.num_bands, axis=-1)
        outs = []
        for i, band in enumerate(bands):
            t = leaky_relu(instance_norm(Conv1x3(band_dim, self.compute_dtype, name=f"conv1_{i}")(band), self.eps), self.slope)
            t = instance_norm(Conv1x3(band_dim, self.compute_dtype, name=f"conv2_{i}")(t), self.eps)
            outs.append(t)
        return x + jnp.concatenate(outs, axis=-1)
