"""Loss function unit tests: torch parity, weight-mask exactness, spectral loss."""
import numpy as np

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.train import losses


def _pt(B=3, T=20, C=64, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.standard_normal((B, T, C)).astype(np.float32)
    target = rng.standard_normal((B, T, C)).astype(np.float32)
    w = np.ones(B, np.float32)
    return pred, target, w


class TestLosses:
    def test_l1_matches_torch(self):
        import torch
        pred, target, w = _pt()
        got = float(losses.l1_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w)))
        want = float(torch.nn.L1Loss()(torch.from_numpy(pred), torch.from_numpy(target)))
        assert abs(got - want) < 1e-6

    def test_mse_matches_torch(self):
        import torch
        pred, target, w = _pt(seed=1)
        got = float(losses.mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w)))
        want = float(torch.nn.MSELoss()(torch.from_numpy(pred), torch.from_numpy(target)))
        assert abs(got - want) < 1e-6

    def test_weight_mask_drops_padded_items(self):
        pred, target, _ = _pt(B=4, seed=2)
        w_full = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        got = float(losses.l1_loss(jnp.asarray(pred), jnp.asarray(target), w_full))
        want = float(losses.l1_loss(jnp.asarray(pred[:2]), jnp.asarray(target[:2]),
                                    jnp.ones(2)))
        assert abs(got - want) < 1e-6

    def test_multiscale_spectral_loss_properties(self):
        rng = np.random.default_rng(3)
        spec = np.abs(rng.standard_normal((2, 40, 1025))).astype(np.float32)
        w = jnp.ones(2)
        zero = float(losses.multiscale_spectral_loss(jnp.asarray(spec), jnp.asarray(spec), w))
        assert zero < 1e-6
        other = np.abs(rng.standard_normal((2, 40, 1025))).astype(np.float32)
        nonzero = float(losses.multiscale_spectral_loss(jnp.asarray(spec), jnp.asarray(other), w))
        assert nonzero > zero

    def test_multiscale_spectral_loss_modes(self):
        """Round-5 ablation variants (round-4 verdict missing #3): 'log'
        drops the linear-power mel term (so it must be strictly smaller
        than 'linlog' on the same inputs), 'direct' never inverts the
        compression; all three are zero at equal inputs and have finite
        gradients on an out-of-domain early-training-like prediction."""
        import pytest

        rng = np.random.default_rng(7)
        target = (rng.random((2, 16, 1025)) * 3).astype(np.float32)
        other = (rng.random((2, 16, 1025)) * 3).astype(np.float32)
        w = jnp.ones(2)
        vals = {}
        for mode in ("linlog", "log", "direct"):
            zero = float(losses.multiscale_spectral_loss(
                jnp.asarray(target), jnp.asarray(target), w, mode=mode))
            assert zero < 1e-6, (mode, zero)
            vals[mode] = float(losses.multiscale_spectral_loss(
                jnp.asarray(other), jnp.asarray(target), w, mode=mode))
            assert vals[mode] > 1e-4, (mode, vals[mode])
        assert vals["log"] < vals["linlog"]  # a nonneg term was dropped
        # gradient safety, same adversarial prediction as the NaN
        # regression test above
        pred = target.copy()
        pred[0, 0, :10] = 120.0
        pred[0, 1, :100] = 0.0
        pred[0, 2, :100] = -0.3
        for mode in ("log", "direct"):
            g = jax.grad(lambda p: losses.multiscale_spectral_loss(
                p, jnp.asarray(target), w, mode=mode))(jnp.asarray(pred))
            assert np.all(np.isfinite(np.asarray(g))), mode
        with pytest.raises(ValueError, match="mode"):
            losses.multiscale_spectral_loss(
                jnp.asarray(other), jnp.asarray(target), w, mode="mel")

    def test_mel_multiscale_spectral_loss_properties(self):
        """Mel-domain variant (autoencoder family, losses.py): zero at equal
        inputs, positive otherwise, weight-mask exact, and loud on a bad
        band_scales divisor."""
        import pytest

        rng = np.random.default_rng(4)
        mel = np.log1p(np.abs(rng.standard_normal((2, 16, 32)))).astype(np.float32)
        w = jnp.ones(2)
        zero = float(losses.mel_multiscale_spectral_loss(
            jnp.asarray(mel), jnp.asarray(mel), w))
        assert zero < 1e-6
        other = np.log1p(np.abs(rng.standard_normal((2, 16, 32)))).astype(np.float32)
        nonzero = float(losses.mel_multiscale_spectral_loss(
            jnp.asarray(mel), jnp.asarray(other), w))
        assert nonzero > 1e-3
        # padded items drop exactly
        mel4 = np.concatenate([mel, rng.random((2, 16, 32)).astype(np.float32)])
        oth4 = np.concatenate([other, rng.random((2, 16, 32)).astype(np.float32)])
        masked = float(losses.mel_multiscale_spectral_loss(
            jnp.asarray(mel4), jnp.asarray(oth4), jnp.asarray([1., 1., 0., 0.])))
        assert abs(masked - nonzero) < 1e-6
        with pytest.raises(ValueError, match="not divisible"):
            losses.mel_multiscale_spectral_loss(
                jnp.asarray(mel), jnp.asarray(other), w, band_scales=(5,))

    def test_multiscale_spectral_loss_finite_on_out_of_domain_pred(self):
        """NaN regressions (round-4 TPU gate, w=0.1, lr=1e-3), asserted on
        the GRADIENT (the loss value stayed finite while grads were NaN):
        (a) prediction spikes past ~88 log-power overflow expm1 in f32 —
        clipped to the DSP domain first; (b) elements <= 0 (leaky-ReLU
        negatives / exact relu zeros, i.e. MOST of a real early-training
        output) hit sqrt'(0) = inf when the power went through
        sqrt(expm1(x))**2 — the power is now expm1(x) directly."""
        rng = np.random.default_rng(5)
        target = (rng.random((2, 16, 1025)) * 3).astype(np.float32)
        pred = target.copy()
        pred[0, 0, :10] = 120.0   # (a) would be expm1(120) = inf in f32
        pred[0, 1, :100] = 0.0    # (b) sqrt'(0) = inf with zero cotangent
        pred[0, 2, :100] = -0.3   # (b) leaky-ReLU negatives on the clip floor
        w = jnp.ones(2)
        val = float(losses.multiscale_spectral_loss(
            jnp.asarray(pred), jnp.asarray(target), w))
        assert np.isfinite(val), val
        g = jax.grad(lambda p: losses.multiscale_spectral_loss(
            p, jnp.asarray(target), w))(jnp.asarray(pred))
        assert np.all(np.isfinite(np.asarray(g)))
