"""Benchmark the fused Pallas conv kernel vs jitted XLA on model layer shapes.

Run on the attached TPU: python scripts/bench_pallas.py
Records the honest comparison (see ops/pallas/fused_conv.py docstring).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ml_music_style_transfer_tpu.ops.pallas import fused_conv as fc  # noqa: E402

SHAPES = [
    (16, 860, 1025, 1536, "audio L0"),
    (16, 430, 1536, 2048, "audio L1"),
    (16, 53, 4096, 6144, "audio L4"),
    (16, 860, 128, 256, "midi L0"),
]


def bench(f, *a, n=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    xla = jax.jit(fc.conv1x3_instnorm_lrelu_reference)
    for B, T, Cin, Cout, tag in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, T, Cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal((3, Cin, Cout)) / np.sqrt(3 * Cin)).astype(np.float32)).astype(jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
        got = fc.conv1x3_instnorm_lrelu(x, w, b)
        want = xla(x, w, b)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        tp = bench(lambda *a: fc.conv1x3_instnorm_lrelu(*a), x, w, b)
        tx = bench(xla, x, w, b)
        print(f"{tag}: pallas {tp:.2f} ms | jitted XLA {tx:.2f} ms | "
              f"xla/pallas {tx/tp:.2f}x | maxerr {err:.4f}")


if __name__ == "__main__":
    main()
