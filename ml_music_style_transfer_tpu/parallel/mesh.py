"""Device mesh + sharding rules (the framework's distributed backend).

The reference has NO distributed code (single process, one CUDA device —
model/train.py:27-30,186-187). This module is the TPU-native equivalent
mandated by SURVEY §5: XLA collectives over ICI via jax.sharding.Mesh +
jit/GSPMD, with single-chip runs as the degenerate 1x1 mesh.

Axes:
  - ``data``: batch sharding (DP). Gradients all-reduce via psum inserted by
    GSPMD; collectives ride ICI.
  - ``model``: tensor parallelism over the wide channel dims (TP). The fat
    DenseConcat fusions (up to 10240 -> 6144 -> 4096 features) and encoder
    conv channels shard Megatron-style: first projection column-parallel,
    second row-parallel.

Everything is expressed as PartitionSpecs; GSPMD chooses the collectives.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. data*model must equal len(devices)."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if n != len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_pspec() -> P:
    """Batches shard along their leading (batch) axis on the data axis."""
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(path: str, value: Any, model_size: int) -> P:
    """Megatron-style TP rules keyed on the flax param path.

    - DenseConcat fc1 (``Dense_0/kernel`` (in, hidden)): column-parallel
      -> P(None, 'model'); its bias shards on 'model'
    - DenseConcat fc2 (``Dense_1/kernel`` (hidden, out)): row-parallel
      -> P('model', None); bias replicated
    - conv / transposed-conv kernels (k, in, out): shard the out-channel dim
    - everything else (or non-divisible dims): replicated
    """
    if model_size <= 1:
        return P()
    shape = value.shape
    if re.search(r"Dense_0/(kernel)$", path) and shape[-1] % model_size == 0:
        return P(None, "model")
    if re.search(r"Dense_0/(bias)$", path) and shape[-1] % model_size == 0:
        return P("model")
    if re.search(r"Dense_1/(kernel)$", path) and shape[0] % model_size == 0:
        return P("model", None)
    if path.endswith("/kernel") and len(shape) == 3 and shape[-1] % model_size == 0:
        return P(None, None, "model")
    return P()


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_shardings(params, mesh: Mesh):
    """Tree of NamedShardings for a param pytree under the given mesh."""
    model_size = mesh.shape["model"]

    def one(path, value):
        return NamedSharding(mesh, param_pspec(_path_str(path), value, model_size))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """device_put a param pytree according to the TP rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def activation_constrainer(mesh: Mesh | None):
    """Channel-axis activation constraint for TP, or None on a 1-wide axis.

    Returns f(x) = with_sharding_constraint(x, P(..., 'model')) pinning the
    LAST (channel) dim of an activation to the model axis. Applied to the
    wide activations (DenseConcat hidden, encoder conv block outputs) so
    GSPMD keeps them sharded instead of gathering between ops — per-device
    activation memory then scales ~1/model_size. Dims not divisible by the
    axis are left unconstrained (GSPMD would reject them).
    """
    if mesh is None:
        return None
    size = dict(mesh.shape).get("model", 1)
    if size <= 1:
        return None

    def constrain(x):
        if x.shape[-1] % size != 0:
            return x
        spec = P(*([None] * (x.ndim - 1) + ["model"]))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def per_device_param_bytes(params) -> tuple[int, int]:
    """(per_device_bytes, total_bytes) for a sharded param pytree."""
    import math

    per_dev = total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.nbytes
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        per_dev += math.prod(shard_shape) * leaf.dtype.itemsize
    return per_dev, total
