"""PerformanceNet: dual-encoder conditioned U-Net (Flax linen, TPU layout).

Rebuild of reference model/model.py:111-300 with the exact channel/kernel/
temporal plan:
  - MIDI encoder: 5 DownConvs 128 -> 256,512,1024,2048,4096, pooling on the
    first 4 (model.py:189-198); T: 860 -> 430 -> 215 -> 107 -> 53
  - Audio encoder: 5 DownConvs 1025 -> 1536,2048,3072,4096,6144
    (model.py:201-212), same temporal ladder
  - 5 DenseConcat fusions of the two branches at every depth
    (in=midi+audio, hidden=1.5*midi, out=midi; model.py:216-225)
  - Onset/offset encoder: 3 DownConvs 128 -> 256,512,1024, all pooling;
    returns the last two pooled maps (512ch@215, 1024ch@107) as decoder
    conditions (model.py:111-141)
  - Decoder: 4 UpConvs with kernels 6,4,3,2 (stride 2, pad 1) lifting
    T 53 -> 108 -> 216 -> 431 -> 860 (model.py:228-233); the first two also
    concat onset conditions, indexed deepest-first via the reference's
    ``Onoff_Conditions[i-1]`` quirk (i.e. [-1] then [0], model.py:289-292) —
    replicated exactly
  - 4 MBRBlocks with 2/4/8/16 bands (model.py:236-239)
  - Head: ConvTranspose1d(1024 -> 1025, k3, s1, p1) + LeakyReLU
    (model.py:242-243,299)

I/O contract (channel-last): midi (B, 860, 128), onoff (B, 860, 128),
conditioning spec (B, 860, 1025) -> output (B, 860, 1025). Helpers convert
from/to the reference's channel-first (B, C, T) layout at the public edge.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .layers import DenseConcat, DownConv, MBRBlock, UpConv, ConvTranspose1dTorch, leaky_relu


class OnsetOffsetEncoder(nn.Module):
    """3-level onset/offset condition encoder (reference model.py:111-141)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        conditions = []
        for i in range(cfg.onset_encoder_depth):
            feats = cfg.scaled(cfg.start_channels * (2 ** (i + 1)))
            x, _ = DownConv(feats, pooling=True, compute_dtype=dtype,
                            slope=cfg.leaky_relu_slope, eps=cfg.instance_norm_eps,
                            name=f"down_{i}")(x)
            if i > cfg.onset_encoder_depth - 3:  # last two pooled maps (model.py:139-140)
                conditions.append(x)
        return conditions


class PerformanceNet(nn.Module):
    """Full dual-encoder conditioned U-Net (reference model.py:177-300)."""

    cfg: ModelConfig = ModelConfig()
    # optional TP activation constraint (parallel/mesh.py:activation_constrainer):
    # pins the wide activations (encoder conv outputs, DenseConcat hidden) to
    # the mesh's model axis so GSPMD keeps them sharded between ops
    tp_constrain: Optional[Callable] = None

    @nn.compact
    def __call__(self, x_midi, x_audio, cond, deterministic: bool = True):
        """midi (B,860,128), audio spec (B,860,1025), onoff cond (B,860,128)
        -> (B,860,1025). Argument order matches the reference forward
        (model.py:262: x_midi, x_audio=conditioning spectrogram, cond=onoff).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        midi_plan = cfg.midi_channel_plan
        audio_plan = cfg.audio_channel_plan

        # --- encoders, collecting pre-pool skips (model.py:264-274)
        down = nn.remat(DownConv) if cfg.remat else DownConv
        slope, eps = cfg.leaky_relu_slope, cfg.instance_norm_eps
        midi_skips, audio_skips = [], []
        h = x_midi
        for i, feats in enumerate(midi_plan):
            pooling = i < cfg.depth - 1
            h, before = down(feats, pooling, dtype, slope, eps,
                             constrain=self.tp_constrain, name=f"midi_down_{i}")(h)
            midi_skips.append(before)
        a = x_audio
        for i, feats in enumerate(audio_plan):
            pooling = i < cfg.depth - 1
            a, before = down(feats, pooling, dtype, slope, eps,
                             constrain=self.tp_constrain, name=f"audio_down_{i}")(a)
            audio_skips.append(before)

        # --- bottleneck fusion (model.py:277)
        def dense(i):
            out_midi = midi_plan[-(i + 1)]
            return DenseConcat(int(out_midi * 1.5), out_midi,
                               cfg.dropout_rate, dtype,
                               constrain=self.tp_constrain, name=f"dense_concat_{i}")

        x = dense(0)(h, a, deterministic)

        # --- onset/offset conditions (model.py:279)
        onoff_conditions = OnsetOffsetEncoder(cfg, name="onset_offset_encoder")(cond)

        # --- decoder (model.py:282-292)
        up_specs = [
            # (out_features, upconv_kernel, has_condition)
            (midi_plan[3], 6, True),
            (midi_plan[2], 4, True),
            (midi_plan[2], 3, False),  # out stays at plan[2] (model.py:231-232)
            (midi_plan[2], 2, False),
        ]
        for i, (feats, k, has_cond) in enumerate(up_specs):
            skip = dense(i + 1)(midi_skips[-(i + 2)], audio_skips[-(i + 2)], deterministic)
            # reference indexing quirk: Onoff_Conditions[i-1] => [-1] then [0]
            c = onoff_conditions[i - 1] if has_cond else None
            x = UpConv(feats, k, has_cond, dtype, slope, eps, name=f"up_{i}")(skip, x, c)

        # --- multi-band residual blocks (model.py:295-298)
        for j, bands in enumerate((2, 4, 8, 16)):
            x = MBRBlock(bands, cfg.compat_mbr_noop, dtype, slope, eps, name=f"mbr_{j}")(x)

        # --- head (model.py:242-243, 299)
        x = ConvTranspose1dTorch(cfg.n_out_bins, 3, 1, 1, dtype, name="lastconv")(x)
        return leaky_relu(x, slope).astype(jnp.float32)


def forward_channel_first(model, params, midi_cf, spec_cf, onoff_cf, **kw):
    """Reference-layout adapter: (B,128,860)/(B,1025,860)/(B,128,860) in,
    (B,1025,860) out — the reference's model(score, spec, onoff) signature
    (model/inference.py:84)."""
    out = model.apply(
        params,
        jnp.swapaxes(midi_cf, -1, -2),
        jnp.swapaxes(spec_cf, -1, -2),
        jnp.swapaxes(onoff_cf, -1, -2),
        **kw,
    )
    return jnp.swapaxes(out, -1, -2)


def temporal_ladder(t_in: int = 860, depth: int = 5) -> dict:
    """Pure shape math for tests: the encoder/decoder time ladder."""
    enc = [t_in]
    t = t_in
    for _ in range(depth - 1):
        t = t // 2
        enc.append(t)
    dec = [t]
    for k in (6, 4, 3, 2):
        t = (t - 1) * 2 - 2 + k
        dec.append(t)
    return {"encoder": enc, "decoder": dec}
