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


class TestDropoutKernel:
    """Hardware-PRNG dropout mask (ops/pallas/dropout.py).

    The CPU TPU-interpreter stubs prng_random_bits with zeros, so only the
    wrapper contract is testable here (all-keep mask of value 1/(1-rate));
    real randomness statistics are asserted on the TPU in
    scripts/bench_pallas.py --check-dropout (run on hardware) and guarded by
    the TPU-gated test below.
    """

    def test_wrapper_contract_interpreted(self):
        from ml_music_style_transfer_tpu.ops.pallas import dropout as dk
        rate = 0.2
        m = np.asarray(dk.dropout_mask(jnp.int32(7), (16, 100, 24), rate,
                                       dtype=jnp.float32, interpret=True))
        assert m.shape == (16, 100, 24)
        # zero-bit stub => every element kept at the exact scale
        np.testing.assert_allclose(m, 1.0 / (1.0 - rate), rtol=1e-6)

    def test_keep_threshold_no_uint32_wrap_at_extreme_rates(self):
        """rate -> 1 (keep < 2^-33) must clamp to threshold 0, not wrap to
        uint32 max (which would keep EVERY element)."""
        from ml_music_style_transfer_tpu.ops.pallas import dropout as dk
        assert dk._keep_threshold(1.0 - 2.0**-40) == 0
        assert dk._keep_threshold(1.0 - 2.0**-33) == 0
        # ordinary rates are exact to 2^-32
        assert dk._keep_threshold(0.5) == round(0.5 * 2**32) - 1
        assert dk._keep_threshold(0.2) == round(0.8 * 2**32) - 1
        # rate -> 0 clamps at uint32 max (keep everything), no overflow
        assert dk._keep_threshold(2.0**-40) == 2**32 - 2

    def test_fallback_path_statistics(self):
        """fast_dropout on CPU uses the threefry path: real statistics."""
        from ml_music_style_transfer_tpu.models.layers import fast_dropout
        x = jnp.ones((64, 400, 96), jnp.float32)
        y = np.asarray(fast_dropout(x, jax.random.PRNGKey(0), 0.2))
        frac_zero = float((y == 0).mean())
        assert abs(frac_zero - 0.2) < 0.01
        assert abs(y.mean() - 1.0) < 0.02

    @pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                        reason="hardware PRNG only on TPU")
    def test_mask_statistics_on_tpu(self):
        from ml_music_style_transfer_tpu.ops.pallas import dropout as dk
        rate = 0.2
        m = np.asarray(dk.dropout_mask(jnp.int32(7), (64, 400, 96), rate,
                                       dtype=jnp.float32))
        frac_zero = float((m == 0).mean())
        assert abs(frac_zero - rate) < 0.01, frac_zero
        assert abs(m.mean() - 1.0) < 0.02
        a = np.asarray(dk.dropout_mask(jnp.int32(3), (8, 256), 0.5, dtype=jnp.float32))
        b = np.asarray(dk.dropout_mask(jnp.int32(3), (8, 256), 0.5, dtype=jnp.float32))
        c = np.asarray(dk.dropout_mask(jnp.int32(4), (8, 256), 0.5, dtype=jnp.float32))
        np.testing.assert_array_equal(a, b)
        assert np.any(a != c)


class TestGlGlueKernel:
    """Fused GL consistency glue (ops/pallas/gl_glue.py) == the XLA
    window->OLA->NOLA->crop->reflect-pad->frame->window pipeline."""

    def _xla_glue(self, frames, n_fft=2048, hop=256):
        from ml_music_style_transfer_tpu.ops import stft as jstft
        nf = frames.shape[0]
        window = jnp.asarray(jstft._window_const(n_fft, n_fft))
        inv = jnp.asarray(jstft._wss_inv_const(n_fft, n_fft, hop, nf))
        y = jstft._overlap_add(frames * window, hop) * inv
        y = y[n_fft // 2 : -(n_fft // 2)]
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
        return np.asarray(jstft._frame_dense(y, n_fft, hop, nf) * window)

    @pytest.mark.parametrize("nf,t_tile", [(64, 32), (100, 32)])
    def test_matches_xla_glue(self, nf, t_tile):
        from ml_music_style_transfer_tpu.ops import stft as jstft
        from ml_music_style_transfer_tpu.ops.pallas import gl_glue
        n_fft, hop = 2048, 256
        rng = np.random.default_rng(nf)
        frames = rng.standard_normal((nf, n_fft)).astype(np.float32)
        window = jnp.asarray(jstft._window_const(n_fft, n_fft))
        inv = jnp.asarray(
            jstft._wss_inv_const(n_fft, n_fft, hop, nf).reshape(nf + 7, hop))
        assert gl_glue.supported(nf, n_fft, hop, t_tile)
        got = np.asarray(gl_glue.gl_consistency_frames(
            jnp.asarray(frames), window, inv, t_tile=t_tile, interpret=True))
        want = self._xla_glue(jnp.asarray(frames))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_stft_istft_equivalence(self):
        """glue(irfft(S)) followed by rfft == stft(istft(S)) exactly."""
        from ml_music_style_transfer_tpu.ops import stft as jstft
        from ml_music_style_transfer_tpu.ops.pallas import gl_glue
        n_fft, hop, nf = 2048, 256, 40
        rng = np.random.default_rng(1)
        S = (rng.standard_normal((1025, nf)) + 1j * rng.standard_normal((1025, nf))
             ).astype(np.complex64)
        want = np.asarray(jstft.stft(jstft.istft(jnp.asarray(S), hop, n_fft),
                                     n_fft, hop, n_fft))
        window = jnp.asarray(jstft._window_const(n_fft, n_fft))
        inv = jnp.asarray(
            jstft._wss_inv_const(n_fft, n_fft, hop, nf).reshape(nf + 7, hop))
        F = jnp.fft.irfft(jnp.swapaxes(jnp.asarray(S), -1, -2), n=n_fft, axis=-1)
        G = gl_glue.gl_consistency_frames(F, window, inv, t_tile=8, interpret=True)
        got = np.asarray(jnp.swapaxes(jnp.fft.rfft(G, axis=-1), -1, -2))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
