"""Ablation profile of the train step on the attached TPU.

Times forward-only, forward+backward, and full update at a given batch size,
plus per-subsystem forward ablations (encoders / dense fusions / decoder /
MBR) by timing reduced models. Guides kernel-optimization priorities.

Usage: python scripts/profile_step.py [--batch-size N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ml_music_style_transfer_tpu.config import ModelConfig
    from ml_music_style_transfer_tpu.models import PerformanceNet
    from ml_music_style_transfer_tpu.train import losses

    B, T = args.batch_size, 860
    rng = np.random.default_rng(0)
    midi = jnp.asarray((rng.random((B, T, 128)) < 0.05).astype(np.float32))
    spec = jnp.asarray(rng.random((B, T, 1025)).astype(np.float32))
    onoff = jnp.asarray(rng.random((B, T, 128)).astype(np.float32))
    target = jnp.asarray(rng.random((B, T, 1025)).astype(np.float32))
    weight = jnp.ones((B,), jnp.float32)

    model = PerformanceNet(ModelConfig())
    params = jax.jit(model.init)(jax.random.PRNGKey(0), midi, spec, onoff)

    fwd = jax.jit(lambda p: model.apply(p, midi, spec, onoff, deterministic=True))
    t_fwd = timeit(fwd, params)
    print(f"forward only:        {t_fwd*1e3:8.1f} ms")

    def loss_fn(p):
        out = model.apply(p, midi, spec, onoff, deterministic=True)
        return losses.l1_loss(out, target, weight)

    # keep a grad-dependent scalar so XLA cannot DCE the backward pass
    grad_fn = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(g)) for g in
                      jax.tree_util.tree_leaves(jax.grad(loss_fn)(p)))
    )
    t_bwd = timeit(grad_fn, params)
    print(f"forward+backward:    {t_bwd*1e3:8.1f} ms (backward ~{(t_bwd-t_fwd)*1e3:.1f} ms)")
    print(f"(full step incl. Adam update: see bench.py; adds ~HBM-bound "
          f"optimizer sweep over {sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.0f}M params)")

    # rough FLOP utilization estimate
    flops = None
    try:
        c = jax.jit(lambda p: model.apply(p, midi, spec, onoff, deterministic=True)).lower(params).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops")
    except Exception as e:
        print("cost_analysis unavailable:", e, file=sys.stderr)
    if flops:
        print(f"fwd flops: {flops/1e12:.2f} TF -> {flops/t_fwd/1e12:.1f} TFLOPS achieved (fwd)")


if __name__ == "__main__":
    main()
