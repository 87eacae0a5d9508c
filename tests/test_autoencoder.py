"""Compact spectrogram-autoencoder model family (BASELINE config 3)."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from ml_music_style_transfer_tpu.models import AutoencoderConfig, SpectrogramAutoencoder
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
