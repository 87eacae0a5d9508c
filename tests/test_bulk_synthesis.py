"""Bulk multi-clip synthesis across the data mesh (infer/bulk.py).

Round-2 verdict #9: the per-chip GL optimum (ops/griffinlim.py lax.map)
gains a multi-clip scale-out — clips shard over the 'data' axis and each
device runs its local clips with the same per-chip program, so N-clip
throughput is ~N x single-clip on an N-device mesh at the compute level
(embarrassingly parallel; structurally guaranteed by shard_map, asserted
here via output sharding + exact parity with the single-device program)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ml_music_style_transfer_tpu.config import ModelConfig
from ml_music_style_transfer_tpu.infer import bulk
from ml_music_style_transfer_tpu.ops import griffinlim as jgl

N_ITER = 3  # contract test, not audio quality


def _specs(n, frames=430, seed=0):
    rng = np.random.default_rng(seed)
    return np.abs(rng.standard_normal((n, 1025, frames))).astype(np.float32) * 2.0


class TestBulkGriffinLim:
    def test_matches_per_clip_single_device(self):
        """Mesh-sharded bulk GL == the same per-clip program run one by one."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        specs = _specs(8)
        seeds = np.arange(8, dtype=np.int32)
        mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
        got = bulk.bulk_griffinlim(specs, seeds, mesh=mesh8, n_iter=N_ITER)
        # output is sharded over the data axis (each device computed N/8)
        assert not got.sharding.is_fully_replicated
        got = np.asarray(got)
        for i in range(8):
            want = np.asarray(jgl.griffinlim_from_log_power(
                jnp.asarray(specs[i]), key=jax.random.PRNGKey(i),
                n_iter=N_ITER))
            np.testing.assert_allclose(got[i], want, atol=2e-5, rtol=1e-5,
                                       err_msg=f"clip {i}")

    def test_single_device_degenerate_mesh(self):
        specs = _specs(2, seed=1)
        got = np.asarray(bulk.bulk_griffinlim(specs, [5, 6], n_iter=N_ITER))
        want = np.asarray(jgl.griffinlim_from_log_power(
            jnp.asarray(specs[1]), key=jax.random.PRNGKey(6), n_iter=N_ITER))
        np.testing.assert_allclose(got[1], want, atol=2e-5, rtol=1e-5)

    def test_batch_must_divide_data_axis(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
        with pytest.raises(ValueError, match="divide"):
            bulk.bulk_griffinlim(_specs(6), np.arange(6), mesh=mesh8,
                                 n_iter=N_ITER)

    def test_seed_determinism_across_shardings(self):
        """Per-clip seeds make results independent of the device count."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        specs = _specs(4, seed=2)
        seeds = [3, 1, 4, 1]
        mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
        mesh4 = Mesh(np.array(jax.devices()[:4]), ("data",))
        a = np.asarray(bulk.bulk_griffinlim(specs, seeds, mesh=mesh1, n_iter=N_ITER))
        b = np.asarray(bulk.bulk_griffinlim(specs, seeds, mesh=mesh4, n_iter=N_ITER))
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-5)


class TestPallasGlueInsideShardMap:
    def test_bulk_gl_traces_with_pallas_glue_forced(self, monkeypatch):
        """Regression (round 3, found on the real TPU): with the Pallas GL
        glue active — TPU-only in production, forced here via interpret
        mode — the pallas_call out_shapes carry no `vma`, which shard_map's
        default check_vma=True rejects at TRACE time. bulk_griffinlim must
        keep check_vma=False so the batched-serving path works on TPU; this
        pins it where CPU CI can see it, with output parity against the
        plain-XLA glue."""
        import functools
        from ml_music_style_transfer_tpu.ops import pallas as pk
        from ml_music_style_transfer_tpu.ops.pallas import gl_glue

        monkeypatch.setattr(pk, "on_tpu", lambda: True)
        monkeypatch.setattr(
            gl_glue, "gl_consistency_frames",
            functools.partial(gl_glue.gl_consistency_frames, interpret=True))
        # distinct frames/n_iter: dodge programs cached before the patch
        # (griffinlim's jit keys on shape+statics, _bulk_gl_jit lru-caches)
        specs = _specs(1, frames=438, seed=3)
        got = np.asarray(bulk.bulk_griffinlim(specs, [0], n_iter=4))
        from ml_music_style_transfer_tpu.ops import stft as jstft
        want = np.asarray(jgl.griffinlim(
            jstft.inverse_log_power(jnp.asarray(specs[0]), 20.0),
            key=jax.random.PRNGKey(0), n_iter=4, use_pallas_glue=False))
        np.testing.assert_allclose(got[0], want, atol=2e-4, rtol=1e-3)


class TestBulkSynthesize:
    def test_forward_plus_gl_data_parallel(self):
        """Full bulk path (DP forward -> sharded GL) == per-clip reference."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = ModelConfig(width_mult=1 / 16, compute_dtype="float32")
        from ml_music_style_transfer_tpu.infer.synthesize import _fwd_jit
        from ml_music_style_transfer_tpu.models import PerformanceNet
        rng = np.random.default_rng(0)
        N, T = 8, 860
        roll = (rng.random((N, T, 128)) < 0.05).astype(np.float32)
        onoff = rng.choice([-1.0, 0.0, 1.0], (N, T, 128),
                           p=[0.02, 0.96, 0.02]).astype(np.float32)
        cond = (rng.random((N, T, 1025)) * 2).astype(np.float32)
        model = PerformanceNet(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(roll[:1]), jnp.asarray(cond[:1]),
            jnp.asarray(onoff[:1]))
        mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
        wavs = np.asarray(bulk.bulk_synthesize(
            cfg, params, roll, onoff, cond, mesh=mesh8, n_iter=N_ITER))
        assert wavs.shape[0] == N and np.all(np.isfinite(wavs))
        # reference: single-device forward + per-clip GL with the same seeds
        pred = np.asarray(_fwd_jit(cfg)(
            params, jnp.asarray(roll), jnp.asarray(cond), jnp.asarray(onoff)))
        for i in (0, 7):
            want = np.asarray(jgl.griffinlim_from_log_power(
                jnp.asarray(pred[i].T), key=jax.random.PRNGKey(i),
                n_iter=N_ITER))
            np.testing.assert_allclose(wavs[i], want, atol=3e-4, rtol=1e-3,
                                       err_msg=f"clip {i}")
