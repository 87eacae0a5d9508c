"""Compact spectrogram-autoencoder model family (BASELINE config 3)."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from ml_music_style_transfer_tpu.models import (
    AutoencoderConfig, SpectrogramAutoencoder, make_autoencoder_train_step)
from ml_music_style_transfer_tpu.train import losses


class TestAutoencoder:
    def test_shape_and_overfit(self):
        cfg = AutoencoderConfig(n_bins=128, width=16, compute_dtype="float32")
        model = SpectrogramAutoencoder(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(np.abs(rng.standard_normal((2, 64, 128))).astype(np.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == x.shape

        tx = optax.adam(1e-3)
        opt = tx.init(params)
        w = jnp.ones(2)

        @jax.jit
        def step(p, o):
            def loss_fn(p):
                return losses.l1_loss(model.apply(p, x), x, w)

            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        ls = []
        for _ in range(20):
            params, opt, loss = step(params, opt)
            ls.append(float(loss))
        assert ls[-1] < ls[0] * 0.8, ls

    def test_mel_spectral_train_step(self):
        """The family's stated contract (autoencoder.py docstring / BASELINE
        config 3): spectral-loss train step on MEL frames. Raw 1025-bin
        log-power frames go in; the model reconstructs 32-mel projections
        under the multi-scale mel spectral loss, and overfits."""
        cfg = AutoencoderConfig(n_bins=32, width=16, compute_dtype="float32")
        tr = make_autoencoder_train_step(cfg, sr=44100, n_fft=2048,
                                         learning_rate=3e-3,
                                         band_scales=(1, 2, 4))
        rng = np.random.default_rng(1)
        # synthetic log-power STFT frames in the pipeline's range
        spec = jnp.asarray((rng.random((2, 64, 1025)) * 3).astype(np.float32))
        w = jnp.ones(2)

        mel = tr.mel_encode(spec)
        assert mel.shape == (2, 64, 32)  # the model trains in mel domain
        assert np.all(np.asarray(mel) >= 0)

        model = SpectrogramAutoencoder(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), mel)
        opt = tr.tx.init(params)
        ls = []
        for _ in range(30):
            params, opt, loss = tr.step(params, opt, spec, w)
            ls.append(float(loss))
        assert all(np.isfinite(ls)), ls
        assert ls[-1] < ls[0] * 0.8, ls
        # the loss really is the multi-scale mel spectral distance
        want = float(tr.loss_fn(params, tr.mel_encode(spec), w))
        got = float(losses.mel_multiscale_spectral_loss(
            model.apply(params, tr.mel_encode(spec)), tr.mel_encode(spec), w,
            band_scales=(1, 2, 4)))
        np.testing.assert_allclose(got, want, rtol=1e-6)
