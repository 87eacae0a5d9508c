"""Compact Adam: low-precision moment storage for the HBM-bound optimizer sweep.

The reference uses torch.optim.Adam (model/train.py:188) — float32 moments.
On the v5e the optimizer update is HBM-bandwidth-bound: with f32 m and v it
moves 24 B/param (read g,p,m,v + write p,m,v) ≈ 17.6 GB over the 732M-param
model ≈ 21.5 ms at the ~819 GB/s roofline. optax.adam exposes ``mu_dtype``
(first moment) only; this transform also stores the SECOND moment in a low
precision, cutting traffic to 20 B/param with both moments bf16.

Numerics: all arithmetic runs in the gradient dtype (float32 here) — only the
*storage* between steps is low precision. bf16 keeps ~3 significant digits on
``nu`` whose sqrt halves the relative error; the convergence-parity test
(tests/test_train.py) bounds the trajectory deviation. With both dtypes None
the update is bit-identical to optax.scale_by_adam (asserted in tests).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_compact(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with independent storage dtypes for BOTH moments."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype is not None else None

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count_inc = optax.safe_int32_increment(state.count)
        # arithmetic in the gradient dtype; storage cast happens on write
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(g.dtype) + (1.0 - b1) * g, state.mu, updates)
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(g.dtype) + (1.0 - b2) * (g * g),
            state.nu, updates)
        b1c = 1.0 - b1 ** count_inc.astype(jnp.float32)
        b2c = 1.0 - b2 ** count_inc.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / b1c) / (jnp.sqrt(v / b2c) + eps), mu32, nu32)
        mu = jax.tree_util.tree_map(
            lambda m32, m_old: m32.astype(m_old.dtype), mu32, state.mu)
        nu = jax.tree_util.tree_map(
            lambda v32, v_old: v32.astype(v_old.dtype), nu32, state.nu)
        return out, optax.ScaleByAdamState(count=count_inc, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class ParamEmaState(NamedTuple):
    """Exponential moving average of the PARAMETERS (not the updates)."""

    ema: Any


def param_ema(decay: float) -> optax.GradientTransformation:
    """Track an EMA of the post-update parameters inside the optimizer state.

    Chain LAST (after the learning-rate scale) so ``updates`` are the final
    deltas: the transform passes them through unchanged and folds
    ``params + updates`` into the EMA. The EMA rides in opt_state, so
    checkpointing/resume and mesh sharding apply to it automatically; fetch
    it with :func:`get_param_ema` (e.g. to evaluate/serve smoothed weights).
    The reference has no EMA (train.py:188 bare Adam) — off by default.
    """

    def init(params):
        return ParamEmaState(ema=jax.tree_util.tree_map(jnp.asarray, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("param_ema requires params in update()")
        ema = jax.tree_util.tree_map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates)
        return updates, ParamEmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def find_state(state, predicate):
    """Depth-first scan of a (possibly wrapped/chained) optax state tree for
    the first sub-state matching ``predicate``; None if absent.

    Handles plain tuples/lists and NamedTuple states (chain, MultiSteps,
    InjectHyperparams all nest this way) — the single scanner shared by
    get_param_ema and Trainer.set_lr so wrapper changes are fixed once.
    """
    if predicate(state):
        return state
    if hasattr(state, "_fields"):
        children = tuple(getattr(state, f) for f in state._fields)
    elif isinstance(state, (tuple, list)):
        children = state
    else:
        children = ()
    for c in children:
        r = find_state(c, predicate)
        if r is not None:
            return r
    return None


def get_param_ema(opt_state):
    """Extract the EMA param tree from a (possibly chained) opt_state."""
    s = find_state(opt_state, lambda s: isinstance(s, ParamEmaState))
    if s is None:
        raise ValueError("no ParamEmaState in opt_state — was ema_decay set?")
    return s.ema


def adam_compact(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """Adam with compact moment storage (drop-in for optax.adam).

    Wrap with ``optax.inject_hyperparams(adam_compact)`` to keep the
    plateau scheduler's no-retrace LR injection (train/loop.py).
    """
    return optax.chain(
        scale_by_adam_compact(b1=b1, b2=b2, eps=eps,
                              mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.scale_by_learning_rate(learning_rate),
    )
