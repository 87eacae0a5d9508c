"""Checkpoint save/restore + the reference's hyperparams.json contract.

The reference saves {'epoch','state_dict','optimizer'} tar checkpoints on
test-loss improvement and a hyperparams.json whose ``best_epoch`` field is
the handle inference uses (model/train.py:202-208, inference.py:120-122).
This module keeps that contract — ``checkpoint-{epoch}.msgpack`` +
hyperparams.json with identical field names — and adds what the reference
lacks: a resume path (the reference always restarts at epoch 0,
train.py:194).

Serialization is flax msgpack over the full pytree (params + opt_state +
epoch); sharded arrays gather to host on save and are re-sharded by the
caller on restore.
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Any

import jax
from flax import serialization


class ExperimentState:
    """The reference's mutable hyperparams bag (train.py:32-42), JSON-compatible."""

    def __init__(self, train_epoch: int, test_freq: int, exp_name: str):
        self.train_epoch = train_epoch
        self.test_freq = test_freq
        self.exp_name = exp_name
        self.iter_train_loss: list[float] = []
        self.iter_test_loss: list[float] = []
        self.loss_history: list[float] = []
        self.test_loss_history: list[float] = []
        self.best_loss: float = 1e10
        self.best_epoch: int = 0

    def save(self, exp_dir: str) -> None:
        with open(os.path.join(exp_dir, "hyperparams.json"), "w") as f:
            json.dump(self.__dict__, f)

    @classmethod
    def load(cls, exp_dir: str) -> "ExperimentState":
        with open(os.path.join(exp_dir, "hyperparams.json")) as f:
            d = json.load(f)
        obj = cls(d["train_epoch"], d["test_freq"], d["exp_name"])
        obj.__dict__.update(d)
        return obj


def checkpoint_path(exp_dir: str, epoch: int) -> str:
    return os.path.join(exp_dir, f"checkpoint-{epoch}.msgpack")


def save_checkpoint(exp_dir: str, epoch: int, state: Any) -> str:
    """Write the pytree ``state`` as checkpoint-{epoch}.msgpack."""
    host_state = jax.device_get(state)
    path = checkpoint_path(exp_dir, epoch)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into ``template``'s structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---- orbax sharded/async checkpointing (SURVEY §5 target) ---------------
#
# The msgpack path above gathers every array to the host; past one host (or
# once params shard across a mesh) that is both a scalability wall and a
# step-blocking serialization. The orbax path writes each device's shards
# directly (no host gather of the full tree), optionally asynchronously
# (training continues while the previous checkpoint flushes), and restores
# straight INTO a target sharding.

_ASYNC_CKPTR = None


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        ocp = _orbax()
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def sharded_checkpoint_path(exp_dir: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(exp_dir, f"checkpoint-{epoch}.orbax"))


def save_checkpoint_sharded(exp_dir: str, epoch: int, state: Any,
                            wait: bool = False) -> str:
    """Write checkpoint-{epoch}.orbax asynchronously, per-shard.

    Returns immediately (the flush happens on a background thread; the next
    save/restore/wait_for_async_saves joins it). ``wait=True`` blocks."""
    path = sharded_checkpoint_path(exp_dir, epoch)
    ocp = _orbax()
    ckptr = _async_checkpointer()
    ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_async_saves() -> None:
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def restore_checkpoint_sharded(path: str, template: Any) -> Any:
    """Restore an orbax checkpoint directly into ``template``'s shardings.

    Template leaves that are jax.Arrays (or ShapeDtypeStructs) with a
    ``.sharding`` restore as device arrays with that exact sharding — each
    device reads only its own shard, no full host gather (the msgpack
    restore's weakness). Non-array leaves pass through as concrete values.
    """
    ocp = _orbax()
    wait_for_async_saves()

    def abstr(x):
        if hasattr(x, "sharding") and hasattr(x, "shape"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree_util.tree_map(abstr, template)
    return _async_checkpointer().restore(
        os.path.abspath(path), args=ocp.args.StandardRestore(abstract)
    )


def restore_checkpoint_sharded_host(path: str) -> Any:
    """Restore an orbax checkpoint fully to host (numpy), no template needed
    (shapes/dtypes come from the checkpoint's own metadata)."""
    wait_for_async_saves()
    return _async_checkpointer().restore(os.path.abspath(path))


def restore_params_sharded_host(path: str, key: str = "params") -> Any:
    """Restore ONLY one param-tree subtree of an orbax checkpoint to host.

    Inference startup must not read + materialize the Adam moments (~2x the
    params bytes at flagship size); PyTreeRestore's partial_restore skips
    the other subtrees entirely. ``key`` selects which tree: "params"
    (default) or "ema_params" (written by fit() when ema_decay is set)."""
    ocp = _orbax()
    wait_for_async_saves()
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(os.path.abspath(path))
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    if key not in tree:
        raise ValueError(
            f"checkpoint {path} has no '{key}' tree"
            + (" — was --ema-decay set during training?" if key == "ema_params" else "")
        )
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree[key])
    out = ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item={key: abstract},
                                    partial_restore=True),
    )
    return out[key]


def latest_checkpoint(exp_dir: str) -> tuple[str, int] | None:
    """(path, epoch) of the newest checkpoint (msgpack or orbax) in exp_dir."""
    best = None
    for p in glob.glob(os.path.join(exp_dir, "checkpoint-*.msgpack")) + glob.glob(
        os.path.join(exp_dir, "checkpoint-*.orbax")
    ):
        m = re.search(r"checkpoint-(\d+)\.(msgpack|orbax)$", p)
        if m:
            e = int(m.group(1))
            if best is None or e > best[1]:
                best = (p, e)
    return best


def best_checkpoint(exp_dir: str) -> tuple[str, int]:
    """Resolve the checkpoint inference should load, via hyperparams.json's
    best_epoch (the reference contract, inference.py:120-122).

    Falls back to the reference's own ``checkpoint-{epoch}.tar`` naming
    (train.py:202-204) so an unmodified reference experiment dir loads
    directly (via compat/torch_import.py).

    If best_epoch's checkpoint is absent in ANY format — e.g. a crash during
    an async orbax flush after hyperparams.json was already updated (orbax
    writes to a tmp dir and renames on commit, so an uncommitted save simply
    never appears at its final path) — falls back to the newest checkpoint
    that DID commit rather than returning a dangling path.
    """
    exp = ExperimentState.load(exp_dir)
    path = checkpoint_path(exp_dir, exp.best_epoch)
    if not os.path.exists(path):
        for alt in (sharded_checkpoint_path(exp_dir, exp.best_epoch),
                    os.path.join(exp_dir, f"checkpoint-{exp.best_epoch}.tar")):
            if os.path.exists(alt):
                return alt, exp.best_epoch
        latest = latest_checkpoint(exp_dir)
        if latest is not None:
            print(f"warning: best_epoch={exp.best_epoch} checkpoint missing "
                  f"(crash during async save?); using {latest[0]}")
            return latest
    return path, exp.best_epoch
