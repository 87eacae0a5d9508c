"""Device-resident dataset: the zero-host-transfer training path.

Measured on this setup, host->device bandwidth is ~0.05 GB/s (tunneled TPU),
so streaming spectrogram batches (~500 MB per batch-64 step) costs ~10 s
against a 0.31 s train step — host streaming is 30x transfer-bound. The
TPU-native answer: park the ENTIRE dataset in HBM once and assemble batches
on-device inside the jitted step:

  - raw audio chunks (219,904 samples) upload as bfloat16 — 8x smaller than
    float32 spectrograms (1025x860) — and log-power STFTs are recomputed
    on-device per step (ops/stft.py, ~1.3M frames/s, fused into the step)
  - piano-rolls/onoff upload as int8 (values in {-1, 0, 1})
  - per-step host traffic is just the index vectors (a few hundred bytes):
    the style/conditioning sampling (reference train.py:88-91 semantics)
    stays on the host RNG

Requires preprocessing with --store-audio (audio_{style} HDF5 keys).
MusicNet-piano scale (~1.7k chunks x 5 styles) is ~3.7 GB in HBM alongside
the 732M-param model + Adam state.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig, DEFAULT_DSP
from .hdf5_store import load_dataset


def _put(x, sharding):
    """device_put with an explicit sharding, or default placement if None."""
    return jax.device_put(x) if sharding is None else jax.device_put(x, sharding)


class DeviceDataStore:
    """All chunks resident in HBM; batch gather + STFT happen on-device.

    ``mesh``: compose the resident path with the DP/TP/hybrid mesh
    (parallel/mesh.py) — the round-2 gap was that the fastest data path
    (resident) and the scaling path (mesh) were mutually exclusive. With a
    mesh, the store arrays are placed with explicit NamedShardings and the
    per-step index vectors shard over the batch axes, so the jitted gather
    emits per-device batch shards with no host involvement:

      - ``store_sharding="replicated"`` (default): every device holds the
        full store; index gathers are local (no collectives in the input
        path). Right when the dataset fits per-device HBM.
      - ``store_sharding="data"``: store rows shard over the data axis
        (1/data_size HBM per device); GSPMD inserts the cross-device gather
        collectives. Right when the dataset is the HBM constraint.
    """

    def __init__(self, path: str, n_read: int | None = None,
                 hp: DSPConfig = DEFAULT_DSP, seed: int = 42,
                 audio_dtype=jnp.bfloat16, mesh=None,
                 store_sharding: str = "replicated"):
        """``audio_dtype`` trades HBM/bandwidth for target fidelity.

        NOTE (documented divergence): bfloat16 audio (default) means the
        train/cond spectrograms — log1p(|STFT|^2) of ~8-bit-mantissa audio —
        differ numerically from the float32 host-streamed path; the two
        training modes optimize slightly different targets. Pass
        ``audio_dtype=jnp.float32`` for exact parity when the dataset fits
        (full MusicNet-piano audio is ~7.5 GB f32 vs ~3.7 GB bf16 in HBM,
        alongside the 732M-param model + Adam state).
        """
        if store_sharding not in ("replicated", "data"):
            raise ValueError(f"unknown store_sharding {store_sharding!r}")
        raw = load_dataset(path, n_read=n_read, include_specs=False)
        self.styles = sorted(k[len("audio_"):] for k in raw if k.startswith("audio_"))
        if not self.styles:
            raise ValueError(
                f"{path} has no audio_* keys — re-run preprocessing with --store-audio"
            )
        self.hp = hp
        self._seed = seed
        self.rng = np.random.default_rng(seed)
        n_roll = raw["pianoroll"].shape[0]
        bad = {s: raw[f"audio_{s}"].shape[0] for s in self.styles
               if raw[f"audio_{s}"].shape[0] != n_roll}
        if bad:
            raise ValueError(
                f"misaligned dataset {path}: pianoroll has {n_roll} chunks but "
                f"audio styles {bad} differ (style missing for some songs)"
            )
        audio = np.stack([raw[f"audio_{s}"] for s in self.styles])
        roll, onoff = raw["pianoroll"], raw["onoff"]
        self.n_data = int(roll.shape[0])
        if mesh is None:
            self._idx_sharding = None
            audio_sh = row_sh = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import mesh as pmesh

            self._idx_sharding = pmesh.batch_sharding(mesh)
            if store_sharding == "replicated":
                audio_sh = row_sh = pmesh.replicated(mesh)
            else:
                ax = (("dcn", "data") if "dcn" in mesh.axis_names else "data")
                n_shards = mesh.shape["data"] * mesh.shape.get("dcn", 1)
                if self.n_data % n_shards:
                    # pad rows so the chunk axis divides the data axis; host
                    # index draws never reference the padding
                    pad = -(-self.n_data // n_shards) * n_shards - self.n_data
                    audio = np.pad(audio, ((0, 0), (0, pad), (0, 0)))
                    roll = np.pad(roll, ((0, pad), (0, 0), (0, 0)))
                    onoff = np.pad(onoff, ((0, pad), (0, 0), (0, 0)))
                audio_sh = NamedSharding(mesh, P(None, ax))
                row_sh = NamedSharding(mesh, P(ax))
        # (S, N, samples) bf16 and (N, T, 128) int8, uploaded once
        self.audio = _put(jnp.asarray(audio, dtype=audio_dtype), audio_sh)
        self.pianoroll = _put(jnp.asarray(roll, dtype=jnp.int8), row_sh)
        self.onoff = _put(jnp.asarray(onoff, dtype=jnp.int8), row_sh)

    def _put_idx(self, arr, dtype=jnp.int32):
        a = jnp.asarray(arr, dtype)
        if self._idx_sharding is not None:
            return jax.device_put(a, self._idx_sharding)
        return a

    def hbm_bytes(self) -> int:
        return sum(x.nbytes for x in (self.audio, self.pianoroll, self.onoff))

    def draw_epoch_indices(self, batch_size: int, shuffle: bool = True):
        """Host-side index plan for one epoch (tiny transfers only)."""
        order = self.rng.permutation(self.n_data) if shuffle else np.arange(self.n_data)
        n_full = self.n_data // batch_size
        for k in range(n_full):
            idx = order[k * batch_size : (k + 1) * batch_size]
            cond_idx = self.rng.integers(0, self.n_data, batch_size)
            style = self.rng.integers(0, len(self.styles), batch_size)
            yield (self._put_idx(idx), self._put_idx(cond_idx),
                   self._put_idx(style))

    def eval_epoch_indices(self, batch_size: int):
        """Deterministic full-coverage index plan for evaluation.

        Covers every chunk once in order; the final batch is zero-weight
        padded to the static batch size (weighted-exact MSE, mirroring
        ChunkDataset.epoch_batches drop_last=False). Conditioning/style
        draws use a fresh fixed-seed RNG each call so repeated evals measure
        the identical quantity — plateau scheduling stays stable.
        """
        rng = np.random.default_rng(self._seed + 1)
        n_batches = -(-self.n_data // batch_size)
        for k in range(n_batches):
            idx = np.arange(k * batch_size, min((k + 1) * batch_size, self.n_data))
            weight = np.ones(len(idx), np.float32)
            if len(idx) < batch_size:
                pad = batch_size - len(idx)
                idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                weight = np.concatenate([weight, np.zeros(pad, np.float32)])
            cond_idx = rng.integers(0, self.n_data, batch_size)
            style = rng.integers(0, len(self.styles), batch_size)
            yield (self._put_idx(idx), self._put_idx(cond_idx),
                   self._put_idx(style), self._put_idx(weight, jnp.float32))


def gather_batch(store_audio, store_roll, store_onoff, idx, cond_idx, style,
                 hp: DSPConfig = DEFAULT_DSP, weight=None) -> Dict[str, jnp.ndarray]:
    """On-device batch assembly (jit-inlined into the train step).

    Gathers rolls + style-paired audio chunks and computes log-power STFTs
    (target = style's audio at idx, cond = same style at cond_idx), emitting
    the channel-last batch dict the model consumes.
    """
    midi = store_roll[idx].astype(jnp.float32)
    onoff = store_onoff[idx].astype(jnp.float32)
    target_audio = store_audio[style, idx].astype(jnp.float32)
    cond_audio = store_audio[style, cond_idx].astype(jnp.float32)
    from ..ops import stft as jstft  # local import to avoid cycles

    # fused op: matmul-DFT on TPU (no complex intermediate; 2.4x the FFT
    # path — ~35 ms/step at batch 64 in the resident gather), FFT elsewhere
    target = jnp.swapaxes(
        jstft.log_power_stft(target_audio, hp.n_fft, hp.ws), -1, -2)
    cond = jnp.swapaxes(
        jstft.log_power_stft(cond_audio, hp.n_fft, hp.ws), -1, -2)
    if weight is None:
        weight = jnp.ones(idx.shape, jnp.float32)
    return {"midi": midi, "onoff": onoff, "cond": cond, "target": target,
            "weight": weight}
