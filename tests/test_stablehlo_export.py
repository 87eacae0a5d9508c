"""StableHLO deployment artifacts (compat/stablehlo_export.py).

Round-trip contract: serialize -> deserialize -> call must reproduce the
live model/GL bit-close, with params as runtime arguments (the artifact is
checkpoint-independent).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.compat import stablehlo_export as she
from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.models import PerformanceNet
from ml_music_style_transfer_tpu.ops import griffinlim as jgl
from ml_music_style_transfer_tpu.ops import stft as jstft

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")
T = 220


def _inputs(batch=1, seed=0):
    rng = np.random.default_rng(seed)
    midi = (rng.random((batch, T, 128)) < 0.05).astype(np.float32)
    cond = rng.random((batch, T, 1025)).astype(np.float32)
    onoff = rng.choice([-1.0, 0.0, 1.0], (batch, T, 128),
                       p=[0.02, 0.96, 0.02]).astype(np.float32)
    return jnp.asarray(midi), jnp.asarray(cond), jnp.asarray(onoff)


class TestForwardArtifact:
    def test_roundtrip_matches_live_model(self, tmp_path):
        model = PerformanceNet(TINY)
        midi, cond, onoff = _inputs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), midi, cond, onoff)
        want = np.asarray(model.apply(params, midi, cond, onoff,
                                      deterministic=True))

        paths = she.write_artifacts(str(tmp_path), TINY, t=T, n_iter=4,
                                    frames=T)
        loaded = she.load_artifact(paths["forward"])
        got = np.asarray(loaded.call(params, midi, cond, onoff))
        # AOT-compiled artifact vs live jit fuse slightly differently:
        # f32 rounding only (measured max 8.4e-5 on O(1) outputs)
        np.testing.assert_allclose(got, want, atol=3e-4)

        import json
        with open(paths["manifest"]) as f:
            man = json.load(f)
        assert man["forward"]["t"] == T
        assert man["jax_version"] == jax.__version__

    def test_params_are_arguments_not_constants(self, tmp_path):
        """The same artifact must serve different checkpoints."""
        model = PerformanceNet(TINY)
        midi, cond, onoff = _inputs()
        exp = she.export_forward(TINY, t=T)
        blob = bytes(exp.serialize())
        loaded = jax.export.deserialize(bytearray(blob))
        outs = []
        for seed in (0, 1):
            params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                         midi, cond, onoff)
            outs.append(np.asarray(loaded.call(params, midi, cond, onoff)))
        assert np.abs(outs[0] - outs[1]).max() > 1e-4


class TestServingArtifact:
    def test_fused_serving_roundtrip_matches_python_path(self, tmp_path):
        """The fused serving artifact (cond STFT + tile gather + forward +
        blend + Griffin-Lim in ONE program, round-3 verdict #8) must
        reproduce AudioSynthesizer.synthesize_waveform exactly for a clip
        whose length aligns the two paths' GL frame counts (2.5 chunks =>
        t_gl == l_out == 2150 frames, so the seed-0 phase init is
        identical)."""
        from ml_music_style_transfer_tpu.config import DEFAULT_DSP
        from ml_music_style_transfer_tpu.data import audio_io
        from ml_music_style_transfer_tpu.infer.synthesize import AudioSynthesizer
        from ml_music_style_transfer_tpu.midi import writer as midi_writer
        from ml_music_style_transfer_tpu.midi.parser import Note

        hp = DEFAULT_DSP
        win = hp.windows_per_chunk  # 860
        fs = hp.wps
        t_want = int(2.5 * win)  # 2150
        # half-frame offsets make int(t*fs) exact (midi/pianoroll.py:94-96)
        notes = [Note(60, 100, 0.5 / fs, (t_want - 0.5) / fs),
                 Note(64, 90, 10.5 / fs, (t_want - 10.5) / fs)]
        midi_path = str(tmp_path / "clip.mid")
        midi_writer.save(midi_path, notes)
        rng = np.random.default_rng(3)
        audio = (0.2 * rng.standard_normal(44100 * 4)).astype(np.float32)
        wav_path = str(tmp_path / "timbre.wav")
        audio_io.write_wav(wav_path, audio, 44100)

        model = PerformanceNet(TINY)
        dummy = (jnp.zeros((1, win, 128)), jnp.zeros((1, win, 1025)),
                 jnp.zeros((1, win, 128)))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)
        synth = AudioSynthesizer(str(tmp_path), midi_path, wav_path,
                                 model_cfg=TINY, params=params)
        want = synth.synthesize_waveform(n_iter=6)

        # rebuild the staged inputs the Python path dispatches
        roll, onoff, starts, t_total = synth._chunk_midi(midi_path, True)
        assert t_total == t_want and roll.shape[0] == 4  # alignment holds
        audio_in, _ = audio_io.read_wav(wav_path, sr=hp.sr)
        spec_frames = int(jstft.log_power_stft(
            jnp.asarray(audio_in), hp.n_fft, hp.ws).shape[-1])
        cond_starts = synth._cond_starts(starts, spec_frames, "aligned", win)

        exp = she.export_serving(TINY, n_tiles=4,
                                 audio_samples=len(audio_in), n_iter=6)
        loaded = jax.export.deserialize(bytearray(bytes(exp.serialize())))
        got = np.asarray(loaded.call(
            params, jnp.asarray(audio_in.astype(np.float32)),
            jnp.asarray(roll), jnp.asarray(onoff),
            jnp.asarray(np.asarray(starts, np.int32)),
            jnp.asarray(np.asarray(cond_starts, np.int32)),
            jnp.ones(4, np.float32), jnp.int32(t_total),
            jax.random.PRNGKey(0)))[: t_total * hp.ws]
        assert got.shape == want.shape
        # AOT artifact vs live jit: f32 fusion rounding through the forward
        # + 6 GL iterations
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestGriffinLimArtifact:
    def test_roundtrip_matches_live_gl(self, tmp_path):
        t = np.arange(44100) / 44100.0
        y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        spec = jstft.log_power_stft(jnp.asarray(y))
        frames = spec.shape[-1]
        key = jax.random.PRNGKey(0)
        want = np.asarray(jgl.griffinlim_from_log_power(spec, key=key,
                                                        n_iter=8))
        exp = she.export_griffinlim(n_iter=8, frames=frames)
        loaded = jax.export.deserialize(bytearray(bytes(exp.serialize())))
        got = np.asarray(loaded.call(spec, key))
        np.testing.assert_allclose(got, want, atol=1e-5)
