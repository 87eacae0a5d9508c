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
