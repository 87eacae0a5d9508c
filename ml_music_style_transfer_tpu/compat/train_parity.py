"""Training-dynamics parity harness vs the reference's own train loop.

Runs identical (imported) init + byte-identical batches through

  - the reference's literal ``train()`` (/root/reference/model/train.py:125-149)
    with its optimizer (Adam lr=1e-3, train.py:188) and loss (L1, train.py:132),
    on a torch model assembled from the reference's own block classes and
    forward (compat/torch_mirror.py), and
  - ``train/loop.py``'s jitted ``Trainer.train_step``,

and reports both loss trajectories, the final-param deviation, and the NULL
yardstick: the reference's own f32-vs-f64 self-divergence on the identical
run. Adam's first update is ~lr*sign(grad), so any two floating-point
realizations of one training run diverge wherever |grad| sits at rounding
level; cross-framework parity is therefore asserted *relative to that
self-divergence*, not as bitwise-trajectory equality.

Consumed by tests/test_train_parity.py (assertions) and
scripts/verify_torch_import.py --train-parity (TRAIN_PARITY.json record).
CPU-only, float32, dropout disabled on both sides (the one stochastic op).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import ModelConfig, TrainConfig
from . import torch_export as te
from . import torch_import as ti
from . import torch_mirror as tm

LR = 1e-3  # reference train.py:188

# compat_mbr_noop: the reference MBR blocks' literal 2x behavior — their
# params get zero gradient on both sides (torch discards the band branch,
# we compute 2*x), so both frameworks leave them at init
TINY = ModelConfig(
    width_mult=1 / 16, compute_dtype="float32", compat_mbr_noop=True,
    dropout_rate=0.0,
)


def make_batches(steps: int, t_in: int, batch: int, seed: int = 0):
    """Fixed batch sequence in the reference layout (B, C, T)."""
    from ..models.performance_net import temporal_ladder

    t_out = temporal_ladder(t_in)["decoder"][-1]
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        midi = (rng.random((batch, 128, t_in)) < 0.1).astype(np.float32)
        onoff = rng.choice([-1.0, 0.0, 1.0], (batch, 128, t_in),
                           p=[0.05, 0.9, 0.05]).astype(np.float32)
        cond = (rng.random((batch, 1025, t_in)) * 3).astype(np.float32)
        target = (rng.random((batch, 1025, t_out)) * 3).astype(np.float32)
        batches.append((midi, onoff, cond, target))
    return batches


class ListLoader:
    """Minimal DataLoader stand-in for the reference's train() (it only
    enumerates batches and reads len(loader) / len(loader.dataset))."""

    def __init__(self, batches):
        self.batches = batches
        self.dataset = range(sum(b[0].shape[0] for b in batches))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def run_reference(batches, cfg: ModelConfig = TINY, float64: bool = False):
    """The reference's own train() over the fixed batches -> (init
    state_dict, per-step loss trajectory, final state_dict, ref model mod).

    ``float64=True`` reruns the identical (same-seed) model/data in double
    precision — the null-divergence yardstick.
    """
    import torch
    import torch.optim as optim

    ref_model, ref_train = tm.import_reference()
    torch.manual_seed(0)
    mirror = tm.build_torch_mirror(cfg, ref_model)
    init_sd = {k: v.detach().clone() for k, v in mirror.state_dict().items()}
    if float64:
        mirror = mirror.double()

    cast = (lambda a: torch.from_numpy(a).double()) if float64 else torch.from_numpy
    loader_batches = []
    for midi, onoff, cond, target in batches:
        data = cast(np.concatenate([midi, onoff], axis=1))
        loader_batches.append((data, cast(cond), cast(target)))
    optimizer = optim.Adam(mirror.parameters(), lr=LR)
    iter_train_loss: List[float] = []
    ref_train.train(mirror, 0, ListLoader(loader_batches), optimizer,
                    iter_train_loss)
    final_sd = {k: v.detach().float().numpy()
                for k, v in mirror.state_dict().items()}
    return init_sd, iter_train_loss, final_sd, ref_model


def run_ours(init_state_dict, batches, cfg: ModelConfig = TINY):
    """train/loop.py's Trainer.train_step from the imported init over the
    same batches -> (loss trajectory, final params)."""
    import jax
    import jax.numpy as jnp

    from ..train.loop import Trainer

    trainer = Trainer(model_cfg=cfg, train_cfg=TrainConfig(learning_rate=LR),
                      mesh=None, use_native_loader=False)
    params = ti.convert_state_dict(
        {k: v.numpy() for k, v in init_state_dict.items()})
    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = jax.jit(trainer.tx.init)(params)
    rng = jax.random.PRNGKey(0)  # dropout rate is 0; key value irrelevant
    losses = []
    batch_n = batches[0][0].shape[0]
    for midi, onoff, cond, target in batches:
        b = {
            "midi": jnp.asarray(midi.transpose(0, 2, 1)),
            "onoff": jnp.asarray(onoff.transpose(0, 2, 1)),
            "cond": jnp.asarray(cond.transpose(0, 2, 1)),
            "target": jnp.asarray(target.transpose(0, 2, 1)),
            "weight": jnp.ones((batch_n,), jnp.float32),
        }
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = trainer.train_step(params, opt_state, b, sub)
        losses.append(float(loss))
    return losses, jax.device_get(params)


def _flat_params(tree_or_sd, from_state_dict: bool = False) -> Dict[str, np.ndarray]:
    tree = ti.convert_state_dict(tree_or_sd) if from_state_dict else tree_or_sd
    return te._flatten(tree["params"])


def run(steps: int = 20, t_in: int = 32, batch: int = 2, seed: int = 0,
        cfg: ModelConfig = TINY) -> dict:
    """Full parity run -> metrics dict (trajectories, deviations, null)."""
    batches = make_batches(steps, t_in, batch, seed)
    init_sd, ref_losses, ref_final_sd, _ = run_reference(batches, cfg)
    _, ref_losses64, ref_final_sd64, _ = run_reference(batches, cfg, float64=True)
    our_losses, our_params = run_ours(init_sd, batches, cfg)

    t, t64, ours = map(np.asarray, (ref_losses, ref_losses64, our_losses))
    flat_ours = _flat_params(our_params)
    flat_ref = _flat_params(ref_final_sd, from_state_dict=True)
    flat_ref64 = _flat_params(ref_final_sd64, from_state_dict=True)
    flat_init = _flat_params(
        {k: v.numpy() for k, v in init_sd.items()}, from_state_dict=True)
    scale = max(float(np.abs(v).max()) for v in flat_ref.values())
    return {
        "config": {"steps": steps, "t_in": t_in, "batch": batch, "seed": seed,
                   "width_mult": cfg.width_mult, "lr": LR},
        "torch_losses": [float(x) for x in t],
        "torch_losses_float64": [float(x) for x in t64],
        "jax_losses": [float(x) for x in ours],
        "step0_rel_dev": float(abs(ours[0] - t[0]) / t[0]),
        "trajectory_rel_dev": float(np.max(np.abs(ours - t) / t)),
        "trajectory_null_f64_vs_f32": float(np.max(np.abs(t64 - t) / t)),
        "final_param_max_dev": max(
            float(np.abs(np.asarray(flat_ours[k]) - flat_ref[k]).max())
            for k in flat_ref),
        "final_param_null_f64_vs_f32": max(
            float(np.abs(flat_ref64[k] - flat_ref[k]).max()) for k in flat_ref),
        "param_scale": scale,
        "params_moved_from_init": max(
            float(np.abs(np.asarray(flat_ours[k]) - flat_init[k]).max())
            for k in flat_init),
        "final_params": our_params,  # stripped before JSON serialization
        "init_state_dict": init_sd,
    }
