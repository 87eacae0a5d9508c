"""Inference / synthesis: user MIDI + timbre audio -> styled waveform.

Rebuild of reference model/inference.py:22-110 (AudioSynthesizer):
  - checkpoint resolution via hyperparams.json best_epoch
    (inference.py:120-122) through train/checkpoint.py
  - custom MIDI/audio processing REUSES midi/ + ops/ (the reference
    duplicates its preprocessing code at inference.py:40-49; here there is
    one implementation)
  - XLA needs static shapes, so arbitrary-length MIDI is tiled into
    860-frame chunks (padded at the tail), run as ONE batched jitted forward,
    and the predicted spectrogram chunks are concatenated and trimmed — the
    chunking contract is the same one training uses (SURVEY §5
    long-context note)
  - Griffin-Lim phase recovery (300 iters) runs fully on-device
    (ops/griffinlim.py) instead of the reference's host librosa loop
    (inference.py:105-110)
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig, DEFAULT_DSP, ModelConfig
from ..data import audio_io
from ..midi import parser as midi_parser
from ..midi import pianoroll as pr
from ..models import PerformanceNet
from ..ops import griffinlim as jgl
from ..ops import stft as jstft
from ..train import checkpoint as ckpt


class AudioSynthesizer:
    """Style-transfer synthesis from a trained experiment directory."""

    def __init__(
        self,
        exp_dir: str,
        midi_source: str,
        audio_source: str,
        model_cfg: ModelConfig = ModelConfig(),
        hp: DSPConfig = DEFAULT_DSP,
        checkpoint_path: str | None = None,
        params=None,
    ):
        """``params``: pass an in-memory param pytree to serve directly (e.g.
        right after Trainer.fit, or for benchmarks) — no checkpoint IO."""
        self.exp_dir = exp_dir
        self.hp = hp
        self.midi_source = midi_source
        self.audio_source = audio_source
        if params is not None:
            self.model = PerformanceNet(model_cfg)
            self.model_cfg = model_cfg
            self.params = jax.device_put(params)
            return
        if checkpoint_path is None:
            checkpoint_path, _ = ckpt.best_checkpoint(exp_dir)
        if checkpoint_path.endswith(".tar") and not model_cfg.compat_mbr_noop:
            # Reference checkpoints' MBR conv weights are untrained random
            # init (the reference MBRBlock discards torch.add's result,
            # model.py:172, so they never receive gradients); running them as
            # a real residual silently diverges from the reference model.
            import dataclasses

            print(
                "note: reference .tar checkpoint — forcing "
                "compat_mbr_noop=True for output parity"
            )
            model_cfg = dataclasses.replace(model_cfg, compat_mbr_noop=True)
        self.model = PerformanceNet(model_cfg)
        self.model_cfg = model_cfg
        self.params = self._load_params(checkpoint_path)

    def _load_params(self, path: str):
        if path.endswith(".tar"):
            # a reference (PyTorch) checkpoint: import it directly
            from ..compat import load_reference_checkpoint

            return jax.device_put(load_reference_checkpoint(path))
        t = self.hp.windows_per_chunk
        dummy = (
            jnp.zeros((1, t, self.model_cfg.start_channels), jnp.float32),
            jnp.zeros((1, t, self.model_cfg.start_audio_channels), jnp.float32),
            jnp.zeros((1, t, self.model_cfg.start_channels), jnp.float32),
        )
        template = jax.device_get(
            jax.eval_shape(self.model.init, jax.random.PRNGKey(0), *dummy)
        )
        template = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), template)
        if path.endswith(".orbax"):
            # params-only partial restore: skips the Adam moments (~2x the
            # params bytes at flagship size) that a full restore would read
            state = {"params": ckpt.restore_params_sharded_host(path)}
        else:
            state = ckpt.restore_checkpoint(path, {"params": template})  # ignores extra keys
        return jax.device_put(state["params"])

    # ---- input processing (reference inference.py:37-71, deduplicated) --
    def process_custom_midi_and_audio(self, midi_path: str, audio_path: str,
                                      overlap: bool = True,
                                      cond_mode: str = "aligned"):
        """MIDI -> chunked (N,860,128) roll/onoff; audio -> conditioning spec.

        ``overlap=True`` tiles with 50% overlap; predictions are later
        crossfade-blended (predict_spectrogram), avoiding seams at chunk
        boundaries. (The reference runs arbitrary-length clips in one eager
        pass, inference.py:37-84; XLA's static shapes make tiling the
        TPU-native equivalent — blending recovers the seamless behavior.)

        ``cond_mode`` controls how the conditioning audio is presented:
          - "aligned" (default): the reference feeds the WHOLE clip's
            spectrogram to the audio encoder, however long
            (inference.py:55-62, forwarded unchunked at :82-84), so every
            part of the timbre source influences the output. Statically
            shaped equivalent: each MIDI tile gets the 860-frame cond chunk
            at ITS OWN time position, cyclically extending the audio when it
            is shorter than the MIDI. Returns cond shaped (N, 860, 1025).
          - "center": round-1 fallback — one center crop broadcast to all
            tiles (discards timbre beyond the middle 5 s). (860, 1025).
        """
        if cond_mode not in ("aligned", "center"):
            raise ValueError(f"cond_mode must be 'aligned' or 'center', got {cond_mode!r}")
        hp = self.hp
        mf = midi_parser.load(midi_path)
        roll, onoff = pr.vectorize_notes(mf.notes, hp.wps)
        t_total = roll.shape[0]
        win = hp.windows_per_chunk
        if t_total < win:
            roll = np.pad(roll, ((0, win - t_total), (0, 0)))
            onoff = np.pad(onoff, ((0, win - t_total), (0, 0)))
        hop = win // 2 if overlap else win
        last = max(0, roll.shape[0] - win)
        starts = list(range(0, last + 1, hop))
        if starts[-1] != last:
            starts.append(last)
        # pad the tail so the final aligned chunk is full (non-overlap mode)
        need = starts[-1] + win
        if roll.shape[0] < need:
            pad = need - roll.shape[0]
            roll = np.pad(roll, ((0, pad), (0, 0)))
            onoff = np.pad(onoff, ((0, pad), (0, 0)))
        roll_chunks = np.stack([roll[s : s + win] for s in starts]).astype(np.float32)
        onoff_chunks = np.stack([onoff[s : s + win] for s in starts]).astype(np.float32)
        self._chunk_starts = starts

        audio, _ = audio_io.read_wav(audio_path, sr=hp.sr)
        spec = np.asarray(jstft.log_power_stft(jnp.asarray(audio), hp.n_fft, hp.ws)).T  # (T,1025)
        if cond_mode == "center":
            # center 860 frames (repeat if shorter), broadcast to every tile
            if spec.shape[0] < win:
                reps = -(-win // spec.shape[0])
                spec = np.tile(spec, (reps, 1))
            start = (spec.shape[0] - win) // 2
            cond = spec[start : start + win].astype(np.float32)
        else:
            # per-tile aligned chunks: cyclically extend the cond spec to
            # cover the last tile, then slice at each tile's own start
            need = starts[-1] + win
            if spec.shape[0] < need:
                reps = -(-need // spec.shape[0])
                spec = np.tile(spec, (reps, 1))
            cond = np.stack([spec[s : s + win] for s in starts]).astype(np.float32)
        return roll_chunks, onoff_chunks, cond, t_total

    # ---- synthesis ------------------------------------------------------
    def predict_spectrogram(self, roll_chunks, onoff_chunks, cond, t_total) -> np.ndarray:
        """Batched jitted forward over all chunks -> (t_total, 1025) log-power spec.

        Overlapping chunk predictions (process_custom_midi_and_audio) are
        crossfade-blended with triangular weights, so chunk seams are smooth.
        """
        n, win = roll_chunks.shape[:2]
        cond = np.asarray(cond)
        if cond.ndim == 2:  # one chunk broadcast to all tiles (center mode)
            cond_b = jnp.broadcast_to(jnp.asarray(cond), (n,) + cond.shape)
        else:  # per-tile aligned conditioning (N, 860, 1025)
            cond_b = jnp.asarray(cond)
        if not hasattr(self, "_fwd_jit"):
            # cached: a fresh jax.jit(lambda ...) per call would retrace and
            # recompile on EVERY inference (jit caches by function identity)
            self._fwd_jit = jax.jit(
                lambda p, m, a, c: self.model.apply(p, m, a, c, deterministic=True))
        # bucket the tile count to a multiple of 4 so clips of different
        # lengths share one compiled forward (XLA compiles per static shape);
        # padded tiles are zeros and their predictions are dropped
        n_pad = -(-n // 4) * 4
        def padn(a):
            return jnp.asarray(np.pad(np.asarray(a), ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1)))
        pred = np.asarray(
            self._fwd_jit(self.params, padn(roll_chunks), padn(cond_b),
                          padn(onoff_chunks))
        )[:n]
        starts = getattr(self, "_chunk_starts", None) or [i * win for i in range(n)]
        length = max(s + win for s in starts)
        j = np.arange(win, dtype=np.float32)
        wgt = np.minimum(j + 1.0, win - j)[:, None]  # triangular crossfade
        num = np.zeros((length, pred.shape[-1]), np.float32)
        den = np.zeros((length, 1), np.float32)
        for i, s in enumerate(starts):
            num[s : s + win] += pred[i] * wgt
            den[s : s + win] += wgt
        return (num / np.maximum(den, 1e-9))[:t_total]

    # ---- whole-clip one-pass path (time-sharded across a mesh) ----------
    def process_whole_clip(self, midi_path: str, audio_path: str):
        """Unchunked inputs for the one-pass forward: roll/onoff (T,128) and
        cond spec (T,1025) cyclically extended/cropped to the MIDI's frame
        count (the reference forwards whole clips in one pass and needs the
        two branches' lengths to agree, model/inference.py:82-84)."""
        hp = self.hp
        mf = midi_parser.load(midi_path)
        roll, onoff = pr.vectorize_notes(mf.notes, hp.wps)
        t_total = roll.shape[0]
        audio, _ = audio_io.read_wav(audio_path, sr=hp.sr)
        spec = np.asarray(jstft.log_power_stft(jnp.asarray(audio), hp.n_fft, hp.ws)).T
        if spec.shape[0] < t_total:
            reps = -(-t_total // spec.shape[0])
            spec = np.tile(spec, (reps, 1))
        return (roll.astype(np.float32), onoff.astype(np.float32),
                spec[:t_total].astype(np.float32), t_total)

    def predict_spectrogram_whole_clip(self, roll, onoff, cond_spec, t_total,
                                       mesh=None, axis_name="time") -> np.ndarray:
        """ONE fully-convolutional forward over the entire clip — the
        reference's inference semantics (model/inference.py:82-84: arbitrary
        length, no tiling, InstanceNorm statistics spanning the whole clip) —
        with the time axis sharded over ``mesh`` (parallel/time_shard.py).

        Scales past one chip's HBM for long clips; on a 1-device mesh it is
        the degenerate single-chip whole-clip forward. Returns
        (t_out, n_bins); t_out follows the net's temporal ladder (which for
        non-860-frame inputs differs slightly from t_total, as it does in
        the reference)."""
        from jax.sharding import Mesh
        from ..parallel import time_shard as tsh

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis_name,))
        key = (t_total, axis_name,
               tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
        if getattr(self, "_ts_cache_key", None) != key:
            self._ts_fn, self._ts_pad, self._ts_out = tsh.make_time_sharded_forward(
                self.model_cfg, mesh, t_total, axis_name=axis_name)
            # replicate params onto the mesh ONCE; re-gathering per call
            # would move ~2.9 GB (flagship) over the host link every clip
            self._ts_params = jax.device_put(
                jax.device_get(self.params),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
            self._ts_cache_key = key
        t_pad = self._ts_pad

        def pad_shard(a):
            p = np.zeros((1, t_pad, a.shape[-1]), np.float32)
            p[:, : a.shape[0]] = a
            return tsh.shard_time(jnp.asarray(p), mesh, axis_name)

        out = self._ts_fn(self._ts_params, pad_shard(roll),
                          pad_shard(cond_spec), pad_shard(onoff))
        return np.asarray(out)[0, : self._ts_out]

    def inference(self, n_iter: int = 300, output_dir: str | None = None,
                  overlap: bool = True, cond_mode: str = "aligned") -> list[str]:
        """Full path (reference inference.py:74-91): predict spec -> Griffin-Lim
        on device -> write output-{i}.wav into an auto-numbered directory."""
        chunks = self.process_custom_midi_and_audio(
            self.midi_source, self.audio_source, overlap=overlap,
            cond_mode=cond_mode,
        )
        print("Inferencing spectrogram......")
        spec = self.predict_spectrogram(*chunks)
        out_dir = output_dir or self.create_output_dir()
        # bucket the frame count to a multiple of half a chunk so repeated
        # inferences of similar-length clips reuse one compiled Griffin-Lim
        # (XLA compiles per static shape); padded frames are silence and the
        # surplus samples are trimmed after synthesis
        t = spec.shape[0]
        bucket = self.hp.windows_per_chunk // 2
        t_pad = -(-t // bucket) * bucket
        spec_padded = np.pad(spec, ((0, t_pad - t), (0, 0)))
        wav = np.asarray(
            jgl.griffinlim_from_log_power(
                jnp.asarray(spec_padded.T), key=jax.random.PRNGKey(0), n_iter=n_iter,
                hop_length=self.hp.ws, clip_max=self.hp.clip_log_power_max,
            )
        )[: t * self.hp.ws]
        path = os.path.join(out_dir, "output-1.wav")
        audio_io.write_wav(path, wav, self.hp.sr)
        return [path]

    def create_output_dir(self) -> str:
        """Auto-numbered audio_output_{n} dir (reference inference.py:93-103)."""
        dir_id = 1
        while True:
            out = os.path.join(self.exp_dir, f"audio_output_{dir_id}")
            try:
                os.makedirs(out)
                return out
            except FileExistsError:
                dir_id += 1

    def griffinlim(self, spectrogram: np.ndarray, n_iter: int = 300) -> np.ndarray:
        """Log-power spec (bins, frames) -> waveform, on-device
        (reference inference.py:105-110 signature equivalent)."""
        return np.asarray(
            jgl.griffinlim_from_log_power(
                jnp.asarray(spectrogram), key=jax.random.PRNGKey(0),
                n_iter=n_iter, hop_length=self.hp.ws,
                clip_max=self.hp.clip_log_power_max,
            )
        )
