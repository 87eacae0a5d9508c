"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY §4/§5).

The reference has no distributed code; these tests validate the framework's
mesh/TP/DP layer: sharded params place correctly, the sharded train step
runs, and mesh math equals single-device math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ml_music_style_transfer_tpu.config import ModelConfig, TrainConfig
from ml_music_style_transfer_tpu.parallel import mesh as pmesh
from ml_music_style_transfer_tpu.train.loop import Trainer

TINY = ModelConfig(width_mult=1 / 16, compute_dtype="float32")


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    if len(ds) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return ds


def tiny_batch(B, T=220, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "midi": (rng.random((B, T, 128)) < 0.05).astype(np.float32),
        "onoff": rng.choice([-1, 0, 1], (B, T, 128), p=[0.02, 0.96, 0.02]).astype(np.float32),
        "cond": rng.random((B, T, 1025)).astype(np.float32),
        "target": rng.random((B, T, 1025)).astype(np.float32),
        "weight": np.ones((B,), np.float32),
    }


class TestMesh:
    def test_mesh_shapes(self, devices):
        m = pmesh.make_mesh(4, 2)
        assert m.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            pmesh.make_mesh(3, 2)

    def test_param_sharding_rules(self, devices):
        m = pmesh.make_mesh(4, 2)
        # TP rules: DenseConcat fc1 column-parallel, fc2 row-parallel
        assert pmesh.param_pspec("dense_concat_0/Dense_0/kernel",
                                 np.zeros((64, 32)), 2) == P(None, "model")
        assert pmesh.param_pspec("dense_concat_0/Dense_1/kernel",
                                 np.zeros((32, 16)), 2) == P("model", None)
        assert pmesh.param_pspec("midi_down_0/Conv_0/kernel",
                                 np.zeros((3, 128, 16)), 2) == P(None, None, "model")
        # odd dims replicate
        assert pmesh.param_pspec("lastconv/kernel", np.zeros((3, 64, 1025)), 2) == P()
        assert pmesh.param_pspec("x/bias", np.zeros((7,)), 2) == P()

    def test_params_actually_sharded(self, devices):
        m = pmesh.make_mesh(1, 8)
        tr = Trainer(TINY, TrainConfig(batch_size=8), mesh=m)
        params, _ = tr.init_state(0)
        flat = jax.tree_util.tree_leaves_with_path(params)
        sharded = [
            (pmesh._path_str(p), v) for p, v in flat
            if not v.sharding.is_fully_replicated
        ]
        assert len(sharded) > 10, "expected many TP-sharded params"


class TestDistributedTraining:
    def test_sharded_train_step_runs(self, devices):
        m = pmesh.make_mesh(4, 2)
        tr = Trainer(TINY, TrainConfig(batch_size=8), mesh=m)
        params, opt_state = tr.init_state(0)
        batch = jax.device_put(tiny_batch(8), tr._batch_sharding)
        params, opt_state, loss = tr.train_step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # second step exercises donated buffers
        params, opt_state, loss2 = tr.train_step(params, opt_state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss2))

    def test_mesh_matches_single_device(self, devices):
        """DP+TP math must equal single-device math (same init, same batch)."""
        batch = tiny_batch(8, seed=3)
        results = []
        for mesh in (pmesh.make_mesh(1, 1, devices=devices[:1]), pmesh.make_mesh(4, 2)):
            tr = Trainer(TINY, TrainConfig(batch_size=8), mesh=mesh)
            params, opt_state = tr.init_state(0)
            b = jax.device_put(batch, tr._batch_sharding)
            loss0 = float(tr.eval_step(params, b))
            params, opt_state, tloss = tr.train_step(params, opt_state, b, jax.random.PRNGKey(9))
            loss1 = float(tr.eval_step(params, b))
            results.append((loss0, float(tloss), loss1))
        (a0, a1, a2), (b0, b1, b2) = results
        assert abs(a0 - b0) < 1e-4 * max(1.0, abs(a0))
        assert abs(a2 - b2) < 1e-3 * max(1.0, abs(a2))

    def test_dp_only_mesh(self, devices):
        m = pmesh.make_mesh(8, 1)
        tr = Trainer(TINY, TrainConfig(batch_size=8), mesh=m)
        params, opt_state = tr.init_state(0)
        batch = jax.device_put(tiny_batch(8), tr._batch_sharding)
        _, _, loss = tr.train_step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
