"""Central configuration for the TPU-native music style-transfer framework.

Mirrors the reference's two hyperparameter registries as frozen dataclasses:
- DSP constants (reference: preprocessing/preprocess.py:17-44)
- training/experiment settings (reference: model/train.py:32-42, 211-220)

All fields keep the reference's names and default values so a user of the
reference finds the same knobs here, but everything is a plain dataclass
(CLI-overridable, no hard-coded personal paths).
"""
from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class DSPConfig:
    """Signal-processing constants.

    Reference: preprocessing/preprocess.py:17-44 (class hyperparams).

    Definitions (kept from the reference docstring):
      - window: a pianoroll column / unit of time (``ws`` audio samples)
      - chunk: the pianoroll segment constituting one data point
        (``spc * wps`` windows).
    """

    sr: int = 44100          # sampling rate (preprocess.py:24)
    n_fft: int = 2048        # FFT points (preprocess.py:25)
    stride: int = 512        # windows between successive chunks (preprocess.py:26)
    ws: int = 256            # window size: audio samples per window / STFT hop (preprocess.py:40)
    spc: int = 5             # seconds per chunk (preprocess.py:42)
    clip_log_power_max: float = 20.0  # inverse-compression clip (inference.py:109)

    @property
    def wps(self) -> int:
        """Windows (piano-roll frames) per second: 44100 // 256 = 172 (preprocess.py:41)."""
        return self.sr // self.ws

    @property
    def n_freq_bins(self) -> int:
        """STFT bins: 1 + n_fft // 2 = 1025."""
        return 1 + self.n_fft // 2

    @property
    def windows_per_chunk(self) -> int:
        """Piano-roll windows per chunk: spc * wps = 860 (preprocess.py:86)."""
        return self.spc * self.wps

    @property
    def samples_per_chunk(self) -> int:
        """Audio samples per chunk: (spc*wps - 1) * ws = 219,904 (preprocess.py:66).

        The ``-1`` makes a centered STFT with hop ``ws`` emit exactly
        ``1 + samples//ws = 860`` frames, matching the 860-window roll chunk.
        """
        return (self.spc * self.wps - 1) * self.ws

    @property
    def chunk_hop_samples(self) -> int:
        """Audio samples between chunk starts: ws * stride (preprocess.py:67)."""
        return self.ws * self.stride


# Train/test MusicNet song-id splits and timbre styles
# (reference: preprocessing/preprocess.py:28-36).
PIANO_SCORES: Mapping[str, Tuple[int, ...]] = {
    "train": (
        2240, 2530, 1763, 2308, 2533, 1772, 2444, 2478,
        2509, 1776, 1749, 2486, 2487, 2678, 2490, 2492, 2527,
    ),  # 2491 is dropped in the reference (errors out; preprocess.py:32)
    "test": (2533, 1760),
}

STYLES: Tuple[str, ...] = ("cuba", "aliciakeys", "gentleman", "harpsichord", "upright")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PerformanceNet architecture plan (reference: model/model.py:177-246).

    The full-size reference plan is the default. ``width_mult`` scales every
    channel count (used for CPU tests and multi-chip dry-runs); the temporal
    ladder (860 -> 430 -> 215 -> 107 -> 53 -> ... -> 860) is unchanged.
    """

    depth: int = 5
    start_channels: int = 128          # piano-roll pitch channels (model.py:178)
    start_audio_channels: int = 1025   # STFT bins (model.py:178)
    onset_encoder_depth: int = 3       # model.py:112
    dropout_rate: float = 0.2          # DenseConcat dropout (model.py:100)
    leaky_relu_slope: float = 0.01     # model.py:40
    instance_norm_eps: float = 1e-5    # torch InstanceNorm1d default
    width_mult: float = 1.0
    # MBR compatibility: the reference's MBRBlock residual is a no-op and the
    # block doubles activations (model.py:167-174, torch.add result discarded).
    # False (default) implements the *intended* multi-band residual
    # x + concat(band_branches); True reproduces the reference's 2*x behavior.
    compat_mbr_noop: bool = False
    # Compute dtype for matmul/conv-heavy paths (params stay float32).
    compute_dtype: str = "bfloat16"
    # Rematerialize encoder blocks in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for large activation-memory savings — enables
    # bigger batches / longer sequences when HBM is the constraint.
    remat: bool = False

    def scaled(self, c: int) -> int:
        """Apply width_mult, rounding up to a multiple of 16 (min 16): the
        MBR blocks split midi_plan[2] into up to 16 bands, and 16-multiples
        keep every width on friendly MXU tile shapes."""
        v = max(16, int(round(c * self.width_mult)))
        return -(-v // 16) * 16

    @property
    def midi_channel_plan(self) -> Tuple[int, ...]:
        """MIDI-encoder output channels per level: 256,512,1024,2048,4096 (model.py:191-193)."""
        return tuple(self.scaled(self.start_channels * (2 ** (i + 1))) for i in range(self.depth))

    @property
    def audio_channel_plan(self) -> Tuple[int, ...]:
        """Audio-encoder output channels: 1536,2048,3072,4096,6144 (model.py:201-203)."""
        plan = (int(1024 * 1.5), 2048, int(2048 * 1.5), 4096, int(4096 * 1.5))
        return tuple(self.scaled(c) for c in plan)

    @property
    def n_out_bins(self) -> int:
        """Output spectrogram bins (lastconv out-channels = 1025, model.py:242)."""
        return self.start_audio_channels


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop settings (reference: model/train.py:188-219)."""

    epochs: int = 1
    test_freq: int = 1
    exp_name: str = "piano_test"
    batch_size: int = 16
    learning_rate: float = 1e-3       # Adam lr (train.py:188)
    n_train_read: int | None = None
    n_test_read: int | None = None
    seed: int = 42                    # dataset RNG seed (train.py:47)
    # ReduceLROnPlateau defaults matching torch.optim.lr_scheduler (train.py:191)
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    # Optional DDSP-style multi-scale spectral loss (reference intent:
    # train.py:119-123 engel_loss sketch; README.md:22-23). Off by default —
    # default parity is L1 train / MSE eval (train.py:132, :158).
    spectral_loss_weight: float = 0.0
    # Spectral-loss variant (train/losses.py:multiscale_spectral_loss):
    # "linlog" (linear + log mel terms, the round-4 sweep), "log" (log-mel
    # term only — the round-4 autopsy's named ablation) or "direct"
    # (multi-scale L1 on the log1p outputs themselves, no inversion).
    spectral_loss_mode: str = "linlog"
    # Adam first-moment dtype: None keeps float32 (exact torch.optim.Adam
    # parity, train.py:188); "bfloat16" halves the m-state's HBM bytes and
    # its read+write traffic in the (HBM-bound) optimizer sweep — measured
    # worthwhile on the 731.9M-param flagship where Adam is ~30 ms/step.
    adam_mu_dtype: str | None = None
    # Adam second-moment dtype: optax has no nu_dtype, so a non-None value
    # switches to train/optim.py:adam_compact (storage-only cast; arithmetic
    # stays float32). bf16 m+v cuts the optimizer sweep to 20 B/param.
    adam_nu_dtype: str | None = None
    # Gradient TRANSIT dtype between backward and optimizer: "bfloat16"
    # rounds each grad leaf to bf16 and immediately upcasts, so XLA's
    # materialized grad buffers (written by the conv backward epilogues,
    # read by the optimizer sweep) are half-width while ALL Adam arithmetic
    # stays float32 (the cast pair fuses into producer/consumer). None = f32
    # grads (exact parity). Convergence-parity tested like the moment dtypes.
    grads_dtype: str | None = None
    # Training-quality options absent in the reference (train.py:188 is bare
    # Adam) — both off by default for parity. grad_clip_norm bounds the
    # global update norm (optax.clip_by_global_norm before Adam);
    # warmup_steps linearly ramps the effective LR over the first N steps
    # (composes with the plateau scheduler's injected LR).
    grad_clip_norm: float | None = None
    warmup_steps: int = 0
    # EMA of the params tracked inside opt_state (train/optim.py:param_ema);
    # fetch with get_param_ema for eval/serving. None = off (parity).
    ema_decay: float | None = None
    # Mesh: (data, model) axis sizes; (1, 1) is the single-chip degenerate case.
    mesh_shape: Tuple[int, int] = (1, 1)
    # Gradient accumulation: each train_step call is a microbatch; updates
    # apply (and the LR schedule advances) every k-th call with the MEAN of
    # the k gradients — the standard large-effective-batch recipe when HBM
    # bounds the per-step batch. 1 = off (reference parity; the optax
    # transform is not even wrapped).
    grad_accum: int = 1
    # ZeRO-1: shard optimizer state (Adam moments, EMA) over the data axes.
    # Params stay replicated for compute; each step re-constrains them after
    # the (data-sharded) update, so GSPMD inserts one param all-gather per
    # step in exchange for moments costing 1/N_data HBM per device. Off by
    # default (a no-op on 1-wide data axes either way).
    zero_opt: bool = False


DEFAULT_DSP = DSPConfig()
