"""Parity tests: JAX DSP ops vs the NumPy golden reference (librosa semantics).

This is the assert-based version of the reference's human-in-the-loop
test_griffinlim.py (SURVEY §4): STFT/compression/Griffin-Lim are checked
numerically instead of by listening.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import DEFAULT_DSP
import ml_music_style_transfer_tpu.ops.reference as npref
import ml_music_style_transfer_tpu.ops.stft as jstft
import ml_music_style_transfer_tpu.ops.griffinlim as jgl
import ml_music_style_transfer_tpu.ops.mel as jmel


def _harmonic_signal(n, sr=44100, seed=0):
    """Deterministic piano-ish test signal: decaying harmonics + light noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    y = np.zeros(n)
    for f0 in (220.0, 330.0, 440.0):
        for k in range(1, 6):
            y += (0.5 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 2 * np.pi))
    y *= np.exp(-t * 0.5)
    y += 0.001 * rng.standard_normal(n)
    return (y / np.max(np.abs(y))).astype(np.float32)


def _snr_db(ref, est):
    noise = ref - est
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-30))


class TestSTFT:
    def test_frame_count_contract(self):
        # 219,904-sample chunk -> exactly 860 frames (reference preprocess.py:66)
        hp = DEFAULT_DSP
        assert hp.samples_per_chunk == 219904
        assert jstft.n_frames_for(hp.samples_per_chunk, hp.ws) == 860
        y = _harmonic_signal(hp.samples_per_chunk)
        S = jstft.stft(jnp.asarray(y), hp.n_fft, hp.ws)
        assert S.shape == (1025, 860)

    def test_stft_matches_numpy_reference(self):
        y = _harmonic_signal(40960)
        S_np = npref.stft(y.astype(np.float64), 2048, 256)
        S_jx = np.asarray(jstft.stft(jnp.asarray(y), 2048, 256))
        assert S_jx.shape == S_np.shape
        scale = np.max(np.abs(S_np))
        np.testing.assert_allclose(S_jx / scale, S_np / scale, atol=2e-5)

    def test_stft_batched(self):
        y = np.stack([_harmonic_signal(20480, seed=s) for s in range(3)])
        S_b = np.asarray(jstft.stft(jnp.asarray(y), 2048, 256))
        for i in range(3):
            S_i = np.asarray(jstft.stft(jnp.asarray(y[i]), 2048, 256))
            np.testing.assert_allclose(S_b[i], S_i, atol=1e-6)

    def test_istft_roundtrip(self):
        y = _harmonic_signal(40960)
        S = jstft.stft(jnp.asarray(y), 2048, 256)
        y_rec = np.asarray(jstft.istft(S, 256, length=len(y)))
        assert _snr_db(y, y_rec) > 55.0

    def test_istft_matches_numpy_reference(self):
        y = _harmonic_signal(20480)
        S = npref.stft(y.astype(np.float64), 2048, 256)
        y_np = npref.istft(S, 256, length=len(y))
        y_jx = np.asarray(jstft.istft(jnp.asarray(S.astype(np.complex64)), 256, length=len(y)))
        np.testing.assert_allclose(y_jx, y_np, atol=2e-5)

    def test_log_power_inverse(self):
        y = _harmonic_signal(20480)
        S = jstft.stft(jnp.asarray(y), 2048, 256)
        compressed = jstft.log_power(S)
        mag = np.asarray(jstft.inverse_log_power(compressed))
        np.testing.assert_allclose(mag, np.abs(np.asarray(S)), rtol=1e-3, atol=1e-4)

    def test_log_power_matches_reference(self):
        y = _harmonic_signal(20480)
        spec_np = npref.log_power(npref.stft(y.astype(np.float64), 2048, 256))
        spec_jx = np.asarray(jstft.log_power_stft(jnp.asarray(y)))
        np.testing.assert_allclose(spec_jx, spec_np, atol=1e-3)

    def test_log_power_dft_matches_reference(self):
        """The matmul-DFT forward path (TPU default; 2.5x the FFT at bf16x3
        precision) must clear the SAME librosa-parity bar as the FFT path,
        batched and unbatched."""
        y = _harmonic_signal(20480)
        spec_np = npref.log_power(npref.stft(y.astype(np.float64), 2048, 256))
        spec_jx = np.asarray(jstft.log_power_stft(jnp.asarray(y), transform="dft"))
        np.testing.assert_allclose(spec_jx, spec_np, atol=1e-3)
        batch = np.stack([y, 0.3 * y])
        spec_b = np.asarray(jstft.log_power_stft(jnp.asarray(batch),
                                                 transform="dft"))
        np.testing.assert_allclose(spec_b[0], spec_jx, atol=1e-6)


class TestGriffinLim:
    N_ITER = 32  # reduced for CPU test speed; production default is 300

    def test_matches_numpy_reference_with_same_init(self):
        y = _harmonic_signal(10240)
        mag = np.abs(npref.stft(y.astype(np.float64), 2048, 256)).astype(np.float32)
        rng = np.random.default_rng(7)
        phase = (2 * np.pi * rng.random(mag.shape)).astype(np.float32)
        y_np = npref.griffinlim(
            mag.astype(np.float64), self.N_ITER, 256, init_phase=phase.astype(np.float64)
        )
        y_jx = np.asarray(
            jgl.griffinlim(jnp.asarray(mag), n_iter=self.N_ITER, hop_length=256,
                           init_phase=jnp.asarray(phase))
        )
        assert y_jx.shape[-1] == y_np.shape[-1]
        # float32 vs float64 through 32 FFT iterations: demand close agreement
        assert _snr_db(y_np.astype(np.float64), y_jx.astype(np.float64)) > 35.0

    def test_spectral_convergence(self):
        """GL output's magnitude must approach the target (the real quality bar)."""
        y = _harmonic_signal(10240)
        mag = np.abs(np.asarray(jstft.stft(jnp.asarray(y), 2048, 256)))
        wav = np.asarray(
            jgl.griffinlim(jnp.asarray(mag), key=jax.random.PRNGKey(0),
                           n_iter=self.N_ITER, hop_length=256)
        )
        mag_rec = np.abs(np.asarray(jstft.stft(jnp.asarray(wav), 2048, 256)))
        rel_err = np.linalg.norm(mag - mag_rec) / np.linalg.norm(mag)
        assert rel_err < 0.12, rel_err

    def test_batched_clips_match_per_clip(self):
        """The 3D (clips, bins, frames) path is an on-device lax.map of the
        2D path with per-clip split keys — results must match calling each
        clip separately (serving bulk-synthesis contract)."""
        y0 = _harmonic_signal(10240)
        y1 = _harmonic_signal(10240, seed=5)
        mags = np.stack([
            np.abs(np.asarray(jstft.stft(jnp.asarray(y0), 2048, 256))),
            np.abs(np.asarray(jstft.stft(jnp.asarray(y1 * 0.5), 2048, 256))),
        ])
        key = jax.random.PRNGKey(3)
        batched = np.asarray(jgl.griffinlim(jnp.asarray(mags), key=key,
                                            n_iter=8, hop_length=256))
        keys = jax.random.split(key, 2)
        for b in range(2):
            single = np.asarray(jgl.griffinlim(jnp.asarray(mags[b]), key=keys[b],
                                               n_iter=8, hop_length=256))
            np.testing.assert_allclose(batched[b], single, atol=1e-5, rtol=1e-5)

    def test_full_reference_synthesis_path(self):
        """log-power spec -> waveform (inference.py:105-110 equivalent), jitted."""
        y = _harmonic_signal(10240)
        spec = jstft.log_power_stft(jnp.asarray(y))
        wav = np.asarray(
            jgl.griffinlim_from_log_power(spec, key=jax.random.PRNGKey(1), n_iter=8)
        )
        assert np.all(np.isfinite(wav))
        assert wav.shape[-1] == 256 * (spec.shape[-1] - 1)


class TestMatmulDFTGriffinLim:
    """The MXU matmul-DFT transform pair (transform="dft", default on TPU;
    4.7x per GL iteration over XLA's FFTs at equal spectral error on the
    v5e — scripts/bench_dft_gl.py). On the CPU test mesh it runs in f32."""

    def test_dft_matrices_match_fft(self):
        x = np.random.default_rng(0).standard_normal((7, 2048)).astype(np.float32)
        fwd, inv = jgl._dft_matrices(2048)
        got = np.asarray(jnp.dot(jnp.asarray(x), fwd))
        ref = np.fft.rfft(x, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got[:, :1025], ref.real, atol=2e-4 * scale)
        np.testing.assert_allclose(got[:, 1025:], ref.imag, atol=2e-4 * scale)
        packed = np.concatenate([ref.real, ref.imag], -1).astype(np.float32)
        back = np.asarray(jnp.dot(jnp.asarray(packed), inv))
        np.testing.assert_allclose(back, x, atol=2e-4 * np.abs(x).max())

    def test_dft_gl_matches_fft_gl(self):
        """Same init, same iterations: the two transform pairs are the same
        math, so the waveforms must agree to f32 roundoff accumulation."""
        y = _harmonic_signal(10240)
        mag = jnp.abs(jstft.stft(jnp.asarray(y), 2048, 256))
        phase = jnp.asarray(
            (2 * np.pi * np.random.default_rng(7).random(mag.shape))
            .astype(np.float32))
        w_fft = np.asarray(jgl.griffinlim(mag, n_iter=16, hop_length=256,
                                          init_phase=phase, transform="fft"))
        w_dft = np.asarray(jgl.griffinlim(mag, n_iter=16, hop_length=256,
                                          init_phase=phase, transform="dft"))
        assert _snr_db(w_fft.astype(np.float64), w_dft.astype(np.float64)) > 45.0

    def test_dft_matches_numpy_reference_with_same_init(self):
        """Direct parity vs the NumPy golden (the same bar the FFT path
        clears), so the TPU default path is anchored to the reference."""
        y = _harmonic_signal(10240)
        mag = np.abs(npref.stft(y.astype(np.float64), 2048, 256)).astype(np.float32)
        phase = (2 * np.pi * np.random.default_rng(7).random(mag.shape)).astype(
            np.float32)
        y_np = npref.griffinlim(mag.astype(np.float64), 16, 256,
                                init_phase=phase.astype(np.float64))
        y_jx = np.asarray(jgl.griffinlim(jnp.asarray(mag), n_iter=16,
                                         hop_length=256,
                                         init_phase=jnp.asarray(phase),
                                         transform="dft"))
        assert _snr_db(y_np.astype(np.float64), y_jx.astype(np.float64)) > 35.0

    def test_gl_steps_dft_momentum_survives_block_split(self):
        """gl_shard's Schwarz rounds call gl_steps in blocks with the complex
        carry crossing each boundary: 8 iterations in one block must equal
        4 + 4 with the carry converted out and back in between."""
        y = _harmonic_signal(10240)
        mag = jnp.abs(jstft.stft(jnp.asarray(y), 2048, 256))
        rng = np.random.default_rng(3)
        phase = jnp.asarray((2 * np.pi * rng.random(mag.shape)).astype(np.float32))
        carry0 = (jax.lax.complex(jnp.cos(phase), jnp.sin(phase)),
                  jnp.zeros(mag.shape, jnp.complex64))
        one = jgl.gl_steps(mag, carry0, 8, 256, 2048, transform="dft")
        half = jgl.gl_steps(mag, carry0, 4, 256, 2048, transform="dft")
        two = jgl.gl_steps(mag, half, 4, 256, 2048, transform="dft")
        np.testing.assert_allclose(np.asarray(one[0]), np.asarray(two[0]),
                                   atol=1e-5)

    def test_dft_batched_clips_match_per_clip(self):
        """transform="dft" with 3D input maps the per-clip DFT program over
        clips (true batching measured SLOWER on the v5e — the 3D glue
        lowers badly); per-clip split keys make it match the 2D path."""
        y0 = _harmonic_signal(10240)
        y1 = _harmonic_signal(10240, seed=5)
        mags = np.stack([
            np.abs(np.asarray(jstft.stft(jnp.asarray(y0), 2048, 256))),
            np.abs(np.asarray(jstft.stft(jnp.asarray(y1 * 0.5), 2048, 256))),
        ])
        key = jax.random.PRNGKey(3)
        batched = np.asarray(jgl.griffinlim(jnp.asarray(mags), key=key,
                                            n_iter=8, hop_length=256,
                                            transform="dft"))
        keys = jax.random.split(key, 2)
        for b in range(2):
            single = np.asarray(jgl.griffinlim(jnp.asarray(mags[b]),
                                               key=keys[b], n_iter=8,
                                               hop_length=256,
                                               transform="dft"))
            np.testing.assert_allclose(batched[b], single, atol=1e-5, rtol=1e-5)

    def test_transform_and_glue_auto_rules(self, monkeypatch):
        """Pin the TPU defaults: dft for supported 2D shapes, fft otherwise;
        Pallas glue defaults OFF under dft (measured net loss — BASELINE.md)
        and stays available on the fft path."""
        from ml_music_style_transfer_tpu.ops import pallas as pk

        # on the CPU test mesh: always fft
        assert jgl.resolve_transform(2, 2048, 2048, None) == "fft"
        monkeypatch.setattr(pk, "on_tpu", lambda: True)
        assert jgl.resolve_transform(2, 2048, 2048, None) == "dft"
        assert jgl.resolve_transform(3, 2048, 2048, None) == "fft"  # batched
        assert jgl.resolve_transform(2, 2048, 1024, None) == "fft"  # win!=n_fft
        assert jgl.resolve_transform(2, 2048, 2048, 1000) == "fft"  # length

    def test_dft_rejects_unsupported_shapes(self):
        mag = jnp.ones((1025, 16), jnp.float32)
        carry = (jnp.ones(mag.shape, jnp.complex64),
                 jnp.zeros(mag.shape, jnp.complex64))
        with pytest.raises(ValueError, match="dft"):
            jgl.gl_steps(mag, carry, 2, 256, 1024, transform="dft")


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        fb = np.asarray(jmel.mel_filterbank(44100, 2048, 128))
        assert fb.shape == (128, 1025)
        assert np.all(fb >= 0)
        # every mel band has some support; interior fft bins are covered
        assert np.all(fb.sum(axis=1) > 0)

    def test_mel_projection(self):
        y = _harmonic_signal(20480)
        S = np.asarray(jstft.stft(jnp.asarray(y), 2048, 256))
        power = np.abs(S) ** 2
        m_jx = np.asarray(jmel.melspectrogram_from_power(jnp.asarray(power.astype(np.float32))))
        m_np = npref.mel_filterbank(44100, 2048, 128) @ power
        np.testing.assert_allclose(m_jx, m_np, rtol=2e-3, atol=1e-4)


class TestMFCC:
    def test_mfcc_shape_and_dct_orthonormality(self):
        y = _harmonic_signal(20480)
        S = np.asarray(jstft.stft(jnp.asarray(y), 2048, 256))
        power = (np.abs(S) ** 2).astype(np.float32)
        m = np.asarray(jmel.mfcc_from_power(jnp.asarray(power), n_mfcc=20))
        assert m.shape == (20, power.shape[1])
        assert np.all(np.isfinite(m))
        # DCT-II ortho rows are orthonormal
        d = jmel._dct_const(128, 128)
        np.testing.assert_allclose(d @ d.T, np.eye(128), atol=1e-5)

    def test_mfcc_matches_scipy_dct(self):
        from scipy.fft import dct as sdct
        rng = np.random.default_rng(0)
        x = rng.standard_normal((128,)).astype(np.float64)
        want = sdct(x, type=2, norm="ortho")[:20]
        got = jmel._dct_const(20, 128).astype(np.float64) @ x
        np.testing.assert_allclose(got, want, atol=1e-6)
