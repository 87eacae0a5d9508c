"""Pallas kernel parity tests (interpret mode on the CPU test mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.ops.pallas import fused_conv as fc


def _data(B=3, T=64, Cin=96, Cout=160, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, Cin)).astype(dtype)
    w = (rng.standard_normal((3, Cin, Cout)) / np.sqrt(3 * Cin)).astype(dtype)
    b = rng.standard_normal(Cout).astype(dtype)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)


class TestFusedConvInLrelu:
    def test_matches_unfused_reference(self):
        x, w, b = _data()
        got = fc.conv1x3_instnorm_lrelu(x, w, b, interpret=True)
        want = fc.conv1x3_instnorm_lrelu_reference(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_unaligned_channels_and_batch(self):
        # Cin=1025-like (not a lane multiple), odd batch vs block_b
        x, w, b = _data(B=5, T=40, Cin=130, Cout=72, seed=1)
        got = fc.conv1x3_instnorm_lrelu(x, w, b, block_b=4, interpret=True)
        want = fc.conv1x3_instnorm_lrelu_reference(x, w, b)
        assert got.shape == (5, 40, 72)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_matches_model_layer_semantics(self):
        """Fused kernel == models.layers Conv1x3+instance_norm+leaky_relu."""
        from ml_music_style_transfer_tpu.models import layers

        x, w, b = _data(B=2, T=50, Cin=64, Cout=64, seed=2)
        got = fc.conv1x3_instnorm_lrelu(x, w, b, interpret=True)

        conv = layers.Conv1x3(64, jnp.float32)
        params = {"params": {"Conv_0": {"kernel": w, "bias": b}}}
        want = layers.leaky_relu(layers.instance_norm(conv.apply(params, x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
