"""Model tests: shape contracts, temporal ladder, block semantics.

Validates SURVEY §2's tensor-shape contract and the reference's exact
channel/kernel plan without needing the full-width model on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.models import PerformanceNet, temporal_ladder
from ml_music_style_transfer_tpu.models import layers

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


def tiny_inputs(B=2, T=860, bins=1025):
    rng = np.random.default_rng(0)
    midi = (rng.random((B, T, 128)) < 0.05).astype(np.float32)
    onoff = rng.choice([-1.0, 0.0, 1.0], size=(B, T, 128), p=[0.02, 0.96, 0.02]).astype(np.float32)
    spec = rng.random((B, T, bins)).astype(np.float32)
    return jnp.asarray(midi), jnp.asarray(spec), jnp.asarray(onoff)


class TestPlans:
    def test_reference_channel_plans(self):
        cfg = ModelConfig()  # full size
        assert cfg.midi_channel_plan == (256, 512, 1024, 2048, 4096)   # model.py:191-193
        assert cfg.audio_channel_plan == (1536, 2048, 3072, 4096, 6144)  # model.py:201-203
        assert cfg.n_out_bins == 1025

    def test_temporal_ladder(self):
        lad = temporal_ladder(860)
        assert lad["encoder"] == [860, 430, 215, 107, 53]
        assert lad["decoder"] == [53, 108, 216, 431, 860]  # model.py:229-233 kernels 6,4,3,2

    def test_head_length_preserving(self):
        # lastconv: ConvTranspose1d k3 s1 p1 keeps T: (T-1) - 2 + 3 = T
        assert (860 - 1) * 1 - 2 + 3 == 860


class TestBlocks:
    def test_instance_norm_matches_torch_semantics(self):
        import torch
        x = np.random.default_rng(1).standard_normal((3, 50, 8)).astype(np.float32)
        got = np.asarray(layers.instance_norm(jnp.asarray(x)))
        want = torch.nn.InstanceNorm1d(8)(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_transpose_matches_torch_lengths_and_values(self):
        import torch
        rng = np.random.default_rng(2)
        for k in (6, 4, 3, 2):
            x = rng.standard_normal((1, 10, 4)).astype(np.float32)
            m = layers.ConvTranspose1dTorch(5, k, 2, 1, jnp.float32)
            params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
            y = m.apply(params, jnp.asarray(x))
            tt = torch.nn.ConvTranspose1d(4, 5, k, stride=2, padding=1)
            # copy params: flax kernel (k, in, out) -> torch weight (in, out, k)
            w = np.asarray(params["params"]["kernel"]).transpose(1, 2, 0)
            with torch.no_grad():
                tt.weight.copy_(torch.from_numpy(w))
                tt.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
                want = tt(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
            assert y.shape == want.shape, (k, y.shape, want.shape)
            np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)

    def test_crop_and_concat_against_torch_reference(self):
        import torch
        import torch.nn.functional as F

        def torch_crop_and_concat(upsampled, bypass):
            # the reference's literal implementation (model.py:71-78)
            c = (bypass.size()[2] - upsampled.size()[2]) // 2
            bypass = F.pad(bypass, (-c, -c))
            if bypass.shape[2] > upsampled.shape[2]:
                bypass = F.pad(bypass, (0, -(bypass.shape[2] - upsampled.shape[2])))
            else:
                bypass = F.pad(bypass, (0, bypass.shape[2] - upsampled.shape[2]))
            return torch.cat((upsampled, bypass), 1)

        rng = np.random.default_rng(3)
        for t_up, t_by in [(108, 107), (216, 215), (431, 430), (860, 860), (10, 14), (14, 10)]:
            up = rng.standard_normal((1, 3, t_up)).astype(np.float32)
            by = rng.standard_normal((1, 2, t_by)).astype(np.float32)
            want = torch_crop_and_concat(torch.from_numpy(up), torch.from_numpy(by)).numpy()
            got = np.asarray(
                layers.crop_and_concat(
                    jnp.asarray(up.transpose(0, 2, 1)), jnp.asarray(by.transpose(0, 2, 1))
                )
            ).transpose(0, 2, 1)
            np.testing.assert_allclose(got, want, atol=0)

    def test_mbr_compat_doubles(self):
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 16, 32)).astype(np.float32))
        m = MBR = layers.MBRBlock(4, compat_noop=True, compute_dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)), np.asarray(x) * 2, atol=0)

    def test_mbr_clean_residual(self):
        x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 16, 32)).astype(np.float32))
        m = layers.MBRBlock(4, compat_noop=False, compute_dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        assert y.shape == x.shape
        assert not np.allclose(y, np.asarray(x) * 2)


class TestPerformanceNet:
    def test_shape_contract_tiny_full_T(self):
        """Full 860-frame ladder at 1/16 width: out must be (B, 860, 1025)."""
        model = PerformanceNet(TINY)
        midi, spec, onoff = tiny_inputs()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), midi, spec, onoff)
        out = jax.jit(model.apply)(params, midi, spec, onoff)
        assert out.shape == (2, 860, 1025)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_deterministic_eval_dropout_train_differs(self):
        model = PerformanceNet(TINY)
        midi, spec, onoff = tiny_inputs(B=1, T=220)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), midi, spec, onoff)
        apply_det = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True))
        e1 = apply_det(params, midi, spec, onoff)
        e2 = apply_det(params, midi, spec, onoff)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        t1 = jax.jit(
            lambda p, a, b, c, k: model.apply(p, a, b, c, deterministic=False,
                                              rngs={"dropout": k})
        )(params, midi, spec, onoff, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(t1), np.asarray(e1))

    def test_gradients_flow_everywhere(self):
        model = PerformanceNet(TINY)
        midi, spec, onoff = tiny_inputs(B=1, T=220)  # smaller T for speed
        params = jax.jit(model.init)(jax.random.PRNGKey(0), midi, spec, onoff)

        def loss_fn(p):
            out = model.apply(p, midi, spec, onoff)
            return jnp.mean(jnp.abs(out))

        grads = jax.jit(jax.grad(loss_fn))(params)
        leaves, _ = jax.tree_util.tree_flatten(grads)
        nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
        assert nonzero / len(leaves) > 0.95, f"{nonzero}/{len(leaves)} grads nonzero"


class TestRemat:
    def test_remat_model_matches_and_trains(self):
        """remat=True must not change outputs; grads still flow."""
        from ml_music_style_transfer_tpu.config import ModelConfig
        cfg_r = ModelConfig(width_mult=1 / 16, compute_dtype="float32", remat=True)
        m_plain = PerformanceNet(TINY)
        m_remat = PerformanceNet(cfg_r)
        midi, spec, onoff = tiny_inputs(B=1, T=220)
        params = jax.jit(m_plain.init)(jax.random.PRNGKey(0), midi, spec, onoff)
        y0 = jax.jit(m_plain.apply)(params, midi, spec, onoff)
        y1 = jax.jit(m_remat.apply)(params, midi, spec, onoff)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

        def loss_fn(p):
            return jnp.mean(jnp.abs(m_remat.apply(p, midi, spec, onoff)))

        grads = jax.jit(jax.grad(loss_fn))(params)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
        assert total > 0
