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


def latest_checkpoint(exp_dir: str) -> tuple[str, int] | None:
    """(path, epoch) of the newest checkpoint in exp_dir, or None."""
    best = None
    for p in glob.glob(os.path.join(exp_dir, "checkpoint-*.msgpack")):
        m = re.search(r"checkpoint-(\d+)\.msgpack$", p)
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
    """
    exp = ExperimentState.load(exp_dir)
    path = checkpoint_path(exp_dir, exp.best_epoch)
    if not os.path.exists(path):
        tar = os.path.join(exp_dir, f"checkpoint-{exp.best_epoch}.tar")
        if os.path.exists(tar):
            return tar, exp.best_epoch
    return path, exp.best_epoch
