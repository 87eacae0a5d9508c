"""Time-sharded Griffin-Lim tests on the 8-device virtual mesh.

The quality contract (parallel/gl_shard.py): a 1-device mesh is
bit-identical to the gathered single-device program; on N devices the
Schwarz-iterated shards must reach the single-device SPECTRAL error (the
metric Griffin-Lim itself minimizes), seams absorbed by the crossfade.
The reference has no counterpart (its GL is a host librosa loop,
model/inference.py:105-110)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ml_music_style_transfer_tpu.ops import griffinlim as jgl
from ml_music_style_transfer_tpu.ops import stft as _stft
from ml_music_style_transfer_tpu.parallel import gl_shard

N_FFT, HOP = 512, 128  # small FFT keeps the CPU suite fast; hop | n_fft


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()[:8]), ("time",))


@pytest.fixture(scope="module")
def mesh1():
    return Mesh(np.array(jax.devices()[:1]), ("time",))


def _harmonic_spec(t_frames: int, seed: int = 0):
    """Log-power spec of a multi-partial harmonic clip with a mid-clip
    chord change (so shard seams fall on real structure, not silence)."""
    rng = np.random.default_rng(seed)
    n = HOP * (t_frames - 1)
    t = np.arange(n) / 16000.0
    y = np.zeros(n, np.float32)
    for f0 in (220.0, 277.2, 329.6):
        for k in range(1, 5):
            ph = rng.uniform(0, 2 * np.pi)
            amp = 0.4 / k
            # second half modulates up a fifth: spectral content changes
            f = f0 * k * np.where(np.arange(n) < n // 2, 1.0, 1.5)
            y += (amp * np.sin(2 * np.pi * f * t + ph)).astype(np.float32)
    y *= np.hanning(n).astype(np.float32) ** 0.25
    spec = np.asarray(_stft.log_power_stft(jnp.asarray(y), N_FFT, HOP))
    return np.swapaxes(spec[:, :t_frames], 0, 1)  # (T, bins)


def _spectral_err(wav, spec_t_major):
    """Mean |log-power STFT of wav - target spec| — GL's own objective."""
    got = np.asarray(_stft.log_power_stft(jnp.asarray(wav), N_FFT, HOP))
    want = np.swapaxes(spec_t_major, 0, 1)
    t = min(got.shape[1], want.shape[1])
    return float(np.mean(np.abs(got[:, :t] - want[:, :t])))


class TestShardedGriffinLim:
    def test_one_device_bit_identical_to_gathered(self, mesh1):
        spec = _harmonic_spec(64)
        got = np.asarray(gl_shard.sharded_griffinlim_from_log_power(
            spec, mesh1, n_iter=20, hop_length=HOP, seed=3))
        want = np.asarray(jgl.griffinlim_from_log_power(
            jnp.swapaxes(jnp.asarray(spec), 0, 1), key=jax.random.PRNGKey(3),
            n_iter=20, hop_length=HOP))
        assert got.shape == (64 * HOP,)
        np.testing.assert_array_equal(got[: want.shape[0]], want)
        assert np.all(got[want.shape[0]:] == 0)

    def test_eight_device_reaches_single_device_spectral_error(self, mesh8):
        t_frames = 160  # 20 frames/shard
        spec = _harmonic_spec(t_frames)
        wav_sh = np.asarray(gl_shard.sharded_griffinlim_from_log_power(
            spec, mesh8, n_iter=60, hop_length=HOP, halo=8, rounds=10))
        wav_1d = np.asarray(jgl.griffinlim_from_log_power(
            jnp.swapaxes(jnp.asarray(spec), 0, 1), key=jax.random.PRNGKey(0),
            n_iter=60, hop_length=HOP))
        assert wav_sh.shape == (t_frames * HOP,)
        err_sh = _spectral_err(wav_sh, spec)
        err_1d = _spectral_err(wav_1d, spec)
        # sharded GL is held to the single-device standard (small seam slack)
        assert err_sh <= 1.15 * err_1d, (err_sh, err_1d)

    def test_seed_determinism_and_seed_sensitivity(self, mesh8):
        spec = _harmonic_spec(96)
        kw = dict(n_iter=12, hop_length=HOP, halo=4, rounds=3)
        a = np.asarray(gl_shard.sharded_griffinlim_from_log_power(
            spec, mesh8, seed=5, **kw))
        b = np.asarray(gl_shard.sharded_griffinlim_from_log_power(
            spec, mesh8, seed=5, **kw))
        c = np.asarray(gl_shard.sharded_griffinlim_from_log_power(
            spec, mesh8, seed=6, **kw))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_frame_count_must_divide_mesh(self, mesh8):
        with pytest.raises(ValueError, match="must divide"):
            gl_shard.sharded_griffinlim_from_log_power(
                _harmonic_spec(84), mesh8, n_iter=4, hop_length=HOP)

    def test_shard_must_exceed_halo(self, mesh8):
        with pytest.raises(ValueError, match="halo"):
            gl_shard.sharded_griffinlim_from_log_power(
                _harmonic_spec(64), mesh8, n_iter=4, hop_length=HOP, halo=8)
