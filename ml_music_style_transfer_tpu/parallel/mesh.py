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


def make_mesh(data: int = 1, model: int = 1, devices=None, dcn: int = 1) -> Mesh:
    """Build a (data, model) mesh — or (dcn, data, model) when ``dcn > 1``.

    The ``dcn`` axis is the slow inter-host (data-center-network) dimension
    for multi-host pods: batches shard over (dcn, data) jointly, so the
    gradient all-reduce decomposes into a fast intra-host/ICI psum along
    'data' and one inter-host psum along 'dcn' — the standard hybrid layout.
    TP ('model') stays intra-host, where ICI bandwidth lives. On a
    multi-process runtime call :func:`distributed_init` first; in
    single-process tests any device list reshapes the same way.
    """
    if devices is None:
        devices = jax.devices()
    n = dcn * data * model
    if n != len(devices):
        raise ValueError(
            f"mesh {f'{dcn}x' if dcn > 1 else ''}{data}x{model} needs {n} "
            f"devices, have {len(devices)}")
    if dcn > 1:
        if jax.process_count() > 1:
            # place the slow axis across processes (hosts)
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                (data, model), (dcn, 1), devices=devices
            ).reshape(dcn, data, model)
        else:
            dev_array = np.asarray(devices).reshape(dcn, data, model)
        return Mesh(dev_array, axis_names=("dcn", "data", "model"))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host JAX runtime (idempotent no-op if already
    initialized or single-process). Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars —
    call before any other jax API on each host of a pod."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single-host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def batch_pspec(mesh: Mesh | None = None) -> P:
    """Batches shard along their leading (batch) axis on the data axis —
    jointly over (dcn, data) on a hybrid multi-host mesh."""
    if mesh is not None and "dcn" in mesh.axis_names:
        return P(("dcn", "data"))
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_pspec(mesh))


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


def zero_extend_spec(spec: P, shape, mesh: Mesh) -> P:
    """ZeRO-style extension of a PartitionSpec: additionally shard the
    LARGEST free dim (one not already claimed by another axis) that divides
    by the batch axes' product, along the batch axes ('data', or
    ('dcn','data') jointly on a hybrid mesh).

    The reference has no optimizer-state sharding (single device); this is
    the ZeRO-1 rule (Rajbhandari et al. 2019) expressed as GSPMD specs:
    Adam moments (20 B/param at bf16 compact, 16 GB at full width — a whole
    v5e HBM) drop to 1/N per device while params stay replicated for
    compute. Dims divisible by nothing stay put (biases etc. — trivia)."""
    axes = batch_pspec(mesh)[0]  # 'data' or ('dcn','data')
    n = mesh.shape["data"] * dict(mesh.shape).get("dcn", 1)
    if n <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for i, (dim, taken) in enumerate(zip(shape, entries)):
        if taken is None and dim % n == 0 and dim > best_size:
            best, best_size = i, dim
    if best is None:
        return spec
    entries[best] = axes
    return P(*entries)


def zero_shardings(tree, mesh: Mesh):
    """NamedSharding tree for ZeRO-1 placement of a CONCRETE state pytree:
    every array leaf keeps its existing spec (e.g. TP dims) extended by
    :func:`zero_extend_spec`; scalars stay replicated. Apply with
    jax.device_put / with_sharding_constraint."""

    def one(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        base = getattr(getattr(leaf, "sharding", None), "spec", P())
        return NamedSharding(mesh, zero_extend_spec(base, leaf.shape, mesh))

    return jax.tree_util.tree_map(one, tree)


def per_device_param_bytes(params) -> tuple[int, int]:
    """(per_device_bytes, total_bytes) for a sharded param pytree."""
    import math

    per_dev = total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.nbytes
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        per_dev += math.prod(shard_shape) * leaf.dtype.itemsize
    return per_dev, total
