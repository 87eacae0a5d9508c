"""Benchmark the Pallas GL glue + dropout kernels vs XLA on the real TPU.

python scripts/bench_gl_pallas.py

- Griffin-Lim (the inference hot path, reference model/inference.py:105-110):
  full 300-iteration GL at the 10 s-clip shape, XLA body vs fused-glue body.
- Dropout mask generation (the train-step's largest non-matmul cost):
  hardware-PRNG pallas kernel vs XLA threefry, at the DenseConcat shapes.

Slope-timed (axon's block_until_ready is unreliable; see CLAUDE.md).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ml_music_style_transfer_tpu.ops import griffinlim as jgl  # noqa: E402
from ml_music_style_transfer_tpu.ops.pallas import dropout as dk  # noqa: E402


def slope_time(run, n_lo=1, n_hi=3, warmups=2):
    for _ in range(warmups):
        run(n_lo)
    run(n_hi)  # compile the high-count variant outside the timed region
    t0 = time.perf_counter(); run(n_lo); t1 = time.perf_counter()
    run(n_hi)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def bench_gl():
    n_frames, bins = 2150, 1025  # 10 s clip, 430-frame bucket
    rng = np.random.default_rng(0)
    # realistic log-power magnitudes
    spec = np.abs(rng.standard_normal((bins, n_frames))).astype(np.float32) * 2
    mag = jnp.asarray(np.sqrt(np.expm1(np.clip(spec, 0, 20))))
    key = jax.random.PRNGKey(0)

    def run(n_iter, glue):
        w = jgl.griffinlim(mag, key=key, n_iter=n_iter, use_pallas_glue=glue)
        return float(jnp.abs(w).max())

    # parity (reuses the 100-iter programs the timing compiles)
    wx = np.asarray(jgl.griffinlim(mag, key=key, n_iter=100, use_pallas_glue=False))
    wp = np.asarray(jgl.griffinlim(mag, key=key, n_iter=100, use_pallas_glue=True))
    rel = np.linalg.norm(wx - wp) / max(np.linalg.norm(wx), 1e-9)
    print(f"GL 100-iter waveform rel diff (xla vs pallas-glue): {rel:.2e}", flush=True)

    per100_x = slope_time(lambda n: run(100 * n, False))
    per100_p = slope_time(lambda n: run(100 * n, True))
    t300_x, t300_p = 3 * per100_x, 3 * per100_p
    print(f"GL 300 iters @10s clip: XLA {t300_x*1e3:7.1f} ms | "
          f"pallas-glue {t300_p*1e3:7.1f} ms | speedup {t300_x/t300_p:.2f}x")
    return t300_x, t300_p


def bench_dropout():
    # DenseConcat mask shapes at batch 64 (hidden then out, all 5 levels)
    shapes = [(64 * 53, 6144), (64 * 108, 3072), (64 * 216, 1536),
              (64 * 431, 768), (64 * 860, 384)]
    rate = 0.2
    for shape in shapes:
        key = jax.random.PRNGKey(1)

        @functools.partial(jax.jit, static_argnames=("n",))
        def xla_masks(k, n):
            def body(c, _):
                k2 = jax.random.fold_in(c, 0)
                m = jax.random.bernoulli(k2, 1.0 - rate, shape).astype(jnp.bfloat16)
                return k2, m[0, 0]
            return jax.lax.scan(body, k, None, length=n)[1].sum()

        @functools.partial(jax.jit, static_argnames=("n",))
        def pallas_masks(s0, n):
            def body(c, _):
                m = dk.dropout_mask(c, shape, rate, dtype=jnp.bfloat16)
                return c + 1, m[0, 0]
            return jax.lax.scan(body, s0, None, length=n)[1].sum()

        tx = slope_time(lambda n: float(xla_masks(key, 8 * n)), 1, 3) / 8
        tp = slope_time(lambda n: float(pallas_masks(jnp.int32(3), 8 * n)), 1, 3) / 8
        mb = shape[0] * shape[1] * 2 / 1e6
        print(f"dropout mask {shape} ({mb:.0f} MB bf16): XLA threefry "
              f"{tx*1e3:6.2f} ms | pallas PRNG {tp*1e3:6.2f} ms | {tx/tp:5.1f}x")


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gl"):
        bench_gl()
    if which in ("all", "dropout"):
        bench_dropout()


if __name__ == "__main__":
    main()
