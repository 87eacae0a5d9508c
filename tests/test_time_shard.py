"""Time-axis (context) parallelism tests on the 8-device virtual mesh.

Sharded halo-exchange conv + global InstanceNorm must equal single-device
math bit-for-bit (up to float reassociation)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_music_style_transfer_tpu.parallel import mesh as pmesh
from ml_music_style_transfer_tpu.parallel import time_shard as ts
from ml_music_style_transfer_tpu.models import layers


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8, 1)


def _data(B=2, T=160, Cin=32, Cout=48, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w = (rng.standard_normal((3, Cin, Cout)) / np.sqrt(3 * Cin)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)
    return x, w, b


def _single_device_block(x, w, b):
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1,), [(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ) + b
    y = layers.instance_norm(y)
    return np.asarray(layers.leaky_relu(y))


class TestTimeSharding:
    def test_sharded_block_matches_single_device(self, mesh):
        x, w, b = _data()
        block = ts.make_sharded_conv_block(mesh, "data")
        x_sh = ts.shard_time(jnp.asarray(x), mesh, "data")
        got = np.asarray(block(x_sh, jnp.asarray(w), jnp.asarray(b)))
        want = _single_device_block(x, w, b)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_halo_edges_are_zero_padded(self, mesh):
        """Global edges must behave like conv zero padding, not wraparound."""
        x, w, b = _data(T=80, seed=3)
        block = ts.make_sharded_conv_block(mesh, "data")
        got = np.asarray(block(ts.shard_time(jnp.asarray(x), mesh), jnp.asarray(w), jnp.asarray(b)))
        want = _single_device_block(x, w, b)
        # the very first and last frames are the halo-sensitive ones
        np.testing.assert_allclose(got[:, 0], want[:, 0], atol=1e-4)
        np.testing.assert_allclose(got[:, -1], want[:, -1], atol=1e-4)

    def test_sharded_instance_norm_global_stats(self, mesh):
        rng = np.random.default_rng(5)
        # distinct per-region scales: local stats would give a different answer
        x = np.concatenate([rng.standard_normal((1, 80, 16)) * (i + 1)
                            for i in range(8)], axis=1).astype(np.float32)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        fn = jax.jit(shard_map(
            lambda xl: ts.sharded_instance_norm(xl, "data"),
            mesh=mesh, in_specs=P(None, "data", None), out_specs=P(None, "data", None),
        ))
        got = np.asarray(fn(ts.shard_time(jnp.asarray(x), mesh)))
        want = np.asarray(layers.instance_norm(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)
