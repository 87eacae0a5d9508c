"""Conditioning-STFT sample bucketing: exactness + compile sharing.

Round-5 serving fix: ``AudioSynthesizer._cond_spec_device`` reflect-pads the
timbre waveform on the HOST (the STFT's center semantics) and zero-pads /
trims it to a half-chunk frame bucket's exact sample count, so every audio
length inside a ~2.5 s bucket shares ONE compiled STFT program. Before the
fix the program was keyed on the exact sample count — every novel
timbre-clip length paid a fresh compile mid-request (the ~23 s p99 tails in
DAEMON_SOAK.json). The reference pays librosa's eager CPU cost per clip
instead (model/inference.py:54-62) and has no compile-key concept.

Asserted here:
  - bucketed frames [0, n_valid) are (bit-)identical to the unbucketed
    centered STFT, including at exact bucket boundaries,
  - lengths in one bucket produce one padded shape and do NOT grow the
    jit cache,
  - end-to-end: a novel-length clip whose MIDI/audio fall in already-warmed
    buckets adds ZERO new compiled programs across the whole serving path
    (cond STFT, tile gather, forward+blend, Griffin-Lim).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.data import audio_io
from ml_music_style_transfer_tpu.infer import AudioSynthesizer
from ml_music_style_transfer_tpu.infer import synthesize as syn
from ml_music_style_transfer_tpu.midi import writer as midi_writer
from ml_music_style_transfer_tpu.midi.parser import Note
from ml_music_style_transfer_tpu.models import PerformanceNet
from ml_music_style_transfer_tpu.ops import stft as jstft

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


def _cache_size(jitted):
    get = getattr(jitted, "_cache_size", None)
    return get() if get is not None else None


@pytest.fixture(scope="module")
def tiny_params():
    model = PerformanceNet(TINY)
    t = 860
    dummy = (jnp.zeros((1, t, 128)), jnp.zeros((1, t, 1025)),
             jnp.zeros((1, t, 128)))
    return jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)


def _synth(tmp_path, tiny_params, midi_dur: float, audio_samples: int,
           tag: str):
    rng = np.random.default_rng(hash(tag) % 2**31)
    notes = [Note(60, 90, 0.0, 0.5),
             Note(64, 90, midi_dur - 0.5, midi_dur)]
    mp = str(tmp_path / f"{tag}.mid")
    midi_writer.save(mp, notes)
    wp = str(tmp_path / f"{tag}.wav")
    audio_io.write_wav(
        wp, (rng.standard_normal(audio_samples) * 0.1).astype(np.float32),
        44100)
    return AudioSynthesizer(str(tmp_path), mp, wp, model_cfg=TINY,
                            params=tiny_params)


class TestCondSpecBucketing:
    @pytest.mark.parametrize("n_samples", [
        44100 * 3 + 1234,           # mid-bucket, odd length
        (430 - 1) * 256 + 255,      # last length of bucket 1 (n_valid=430)
        (430 - 1) * 256 + 256,      # first length of bucket 2 (n_valid=431)
        430 * 256,                  # n_valid = 431, trim branch exercised
    ])
    def test_bucketed_frames_match_unbucketed_centered_stft(
            self, tmp_path, tiny_params, n_samples):
        s = _synth(tmp_path, tiny_params, 5.0, n_samples, f"p{n_samples}")
        spec, n_valid = s._cond_spec_device(s.audio_source)
        hp = s.hp
        assert n_valid == 1 + n_samples // hp.ws
        assert spec.shape[0] == -(-n_valid // 430) * 430
        audio, _ = audio_io.read_wav(s.audio_source, sr=hp.sr)
        golden = jnp.swapaxes(
            jstft.log_power_stft(jnp.asarray(audio.astype(np.float32)),
                                 hp.n_fft, hp.ws), -1, -2)
        assert golden.shape[0] == n_valid
        np.testing.assert_allclose(np.asarray(spec)[:n_valid],
                                   np.asarray(golden), rtol=0, atol=2e-5)

    def test_same_bucket_shares_shape_and_program(self, tmp_path,
                                                  tiny_params):
        s1 = _synth(tmp_path, tiny_params, 5.0, 44100 * 3, "s1")
        spec1, _ = s1._cond_spec_device(s1.audio_source)
        before = _cache_size(jstft.log_power_stft)
        s2 = _synth(tmp_path, tiny_params, 5.0, 44100 * 3 + 54321, "s2")
        spec2, _ = s2._cond_spec_device(s2.audio_source)
        assert spec1.shape == spec2.shape
        after = _cache_size(jstft.log_power_stft)
        if before is not None:
            assert after == before, "same-bucket length recompiled the STFT"

    def test_novel_length_end_to_end_adds_no_programs(self, tmp_path,
                                                      tiny_params):
        """A clip whose MIDI (9.3 s) and audio (10.8 s) lengths were never
        seen, but whose buckets match a warmed 10 s clip, must reuse every
        compiled program (the daemon's --warmup contract)."""
        warmed = _synth(tmp_path, tiny_params, 10.0, 44100 * 10, "warm")
        warmed.synthesize_waveform(n_iter=2)
        run = syn._predict_blend_jit(TINY)
        watch = [jstft.log_power_stft, run, syn._cond_tiles]
        before = [_cache_size(f) for f in watch]
        novel = _synth(tmp_path, tiny_params, 9.3,
                       int(44100 * 10.8) + 789, "novel")
        wav = novel.synthesize_waveform(n_iter=2)
        assert np.all(np.isfinite(wav)) and wav.size > 0
        after = [_cache_size(f) for f in watch]
        for name, b, a in zip(("stft", "forward+blend", "cond_tiles"),
                              before, after):
            if b is not None:
                assert a == b, f"novel length recompiled {name}: {b}->{a}"
