"""Time-axis (sequence/context) parallelism for the conv pipeline.

The reference scales sequence length only by fixed-size chunking at
preprocess time (SURVEY §5; preprocess.py:60-96) — there is no attention, so
ring-attention is N/A. The honest TPU equivalent for this fully-convolutional
model is sharding the TIME axis across chips with halo exchange for the conv
receptive field, which this module provides as composable shard_map ops:

  - ``halo_exchange``: 1-frame halos to/from ring neighbors via ppermute
    (zero halos at the global edges = torch conv padding=1 semantics)
  - ``sharded_conv1x3``: halo exchange + local valid conv — bit-equal to the
    unsharded conv
  - ``sharded_instance_norm``: InstanceNorm over the GLOBAL time axis via
    psum of per-shard sums/square-sums (the normalization is over all of T,
    so statistics must cross shards)
  - ``sharded_conv_block``: conv -> global IN -> LeakyReLU, the DownConv
    inner pattern, time-sharded end to end

These ride ICI (psum/ppermute inserted by shard_map) and are validated
against single-device math on the 8-device CPU test mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _ring_perm(n: int, shift: int):
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Append 1-frame halos from ring neighbors to a (B, T_loc, C) shard.

    Returns (B, T_loc + 2, C); the first/last global shard gets zero halos
    (matching conv1x3's zero padding at sequence edges).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_edge = x_local[:, :1, :]
    right_edge = x_local[:, -1:, :]
    # my left halo = right edge of my left neighbor (shard idx-1)
    from_left = jax.lax.ppermute(right_edge, axis_name, _ring_perm(n, 1))
    # my right halo = left edge of my right neighbor (shard idx+1)
    from_right = jax.lax.ppermute(left_edge, axis_name, _ring_perm(n, -1))
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=1)


def _local_conv1x3_valid(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(B, T+2, Cin) x (3, Cin, Cout) -> (B, T, Cout), valid conv."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )


def sharded_instance_norm(x_local: jnp.ndarray, axis_name: str, eps: float = 1e-5):
    """InstanceNorm over the GLOBAL time axis of a time-sharded (B, T_loc, C)."""
    x32 = x_local.astype(jnp.float32)
    t_total = x_local.shape[1] * jax.lax.axis_size(axis_name)
    s1 = jax.lax.psum(jnp.sum(x32, axis=1, keepdims=True), axis_name)
    s2 = jax.lax.psum(jnp.sum(x32**2, axis=1, keepdims=True), axis_name)
    mean = s1 / t_total
    var = s2 / t_total - mean**2
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x_local.dtype)


def make_sharded_conv_block(mesh: Mesh, axis_name: str = "data",
                            eps: float = 1e-5, slope: float = 0.01):
    """Build a jitted time-sharded conv1x3 -> global IN -> LeakyReLU op.

    Input x is (B, T, Cin) sharded on its time axis over ``axis_name``
    (T divisible by the axis size); w (3, Cin, Cout), b (Cout,) replicated.
    Output matches the single-device models.layers pattern exactly.
    """

    def block(x_local, w, b):
        xh = halo_exchange(x_local, axis_name)
        y = _local_conv1x3_valid(xh, w) + b.astype(jnp.float32)
        y = sharded_instance_norm(y, axis_name, eps)
        return jnp.where(y >= 0, y, slope * y)

    fn = shard_map(
        block, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None),
    )
    return jax.jit(fn)


def shard_time(x: jnp.ndarray, mesh: Mesh, axis_name: str = "data"):
    """device_put a (B, T, C) array sharded along time."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name, None)))
