"""Pallas TPU kernel: hardware-PRNG dropout masks.

The reference model applies Dropout(0.2) twice inside every DenseConcat
fusion (model/model.py:98-106) — at batch 64 that is ~250M random draws per
training step. XLA implements jax.random via the counter-based threefry
generator: a long chain of VPU integer ops that measured ~14 ms/step on the
v5e (BASELINE.md profile; jax_default_prng_impl=rbg did not help because the
per-call key-derivation threefry hashes remain). The TPU has a hardware PRNG
that Pallas exposes (pltpu.prng_seed / prng_random_bits); this kernel
generates the scaled keep-mask in one pass at HBM-write speed.

Design:
  - grid over row blocks of the flattened (rows, C) activation shape; each
    program seeds the per-core PRNG with (base_seed, program_id) so blocks
    draw independent streams
  - mask = (bits <= keep_prob * 2^32) * (1 / keep_prob), written in the
    activation dtype; the caller multiplies activations by the mask (so
    autodiff flows through the multiply — the mask itself is a constant)
  - keep probability is exact to 2^-32 (bits are compared against
    round(keep * 2^32) - 1)

The model path (models/layers.DenseConcat via tpu_dropout) uses this kernel
on TPU backends and falls back to flax's nn.Dropout elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _mask_kernel(seed_ref, o_ref, *, threshold: int, scale: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(o_ref.shape), jnp.uint32)
    keep = bits <= jnp.uint32(threshold)
    # select in float32, cast on store: an i1 mask lives in 32-bit (8,128)
    # tiling and Mosaic cannot relayout it into the 16-bit (16,128) tiling a
    # bf16-typed select would demand (observed compile failure on v5e)
    m32 = jnp.where(keep, jnp.float32(scale), jnp.float32(0.0))
    o_ref[:] = m32.astype(o_ref.dtype)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _keep_threshold(rate: float) -> int:
    """uint32 keep threshold: keep iff bits <= threshold.

    Clamped below at 0 — for keep probabilities < 2^-33 round() gives 0 and a
    bare -1 would wrap to uint32 max in the kernel's comparison, keeping
    EVERY element instead of almost none (advisor finding, round 2).
    """
    keep = 1.0 - rate
    return max(min(int(round(keep * 2.0**32)), 2**32 - 1), 1) - 1


@functools.partial(
    jax.jit, static_argnames=("shape", "rate", "dtype", "block_rows", "interpret")
)
def dropout_mask(
    seed: jnp.ndarray,
    shape: tuple[int, ...],
    rate: float,
    dtype=jnp.bfloat16,
    block_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scaled dropout keep-mask of ``shape`` via the TPU hardware PRNG.

    Entries are 1/(1-rate) with probability (1-rate), else 0. ``seed`` is an
    int32 scalar; identical seeds give identical masks (the usual functional
    contract). The result is detached (stop_gradient) — multiply activations
    by it.
    """
    assert 0.0 < rate < 1.0, rate
    keep = 1.0 - rate
    threshold = _keep_threshold(rate)
    total = 1
    for d in shape:
        total *= d
    cols = LANE * 8
    rows = _pad_to(total, cols) // cols
    rows_p = _pad_to(rows, block_rows)
    grid = (rows_p // block_rows,)
    # interpret: the generic HLO interpreter lacks the TPU PRNG primitives,
    # so CPU tests use the TPU-semantics interpreter instead
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        functools.partial(_mask_kernel, threshold=threshold, scale=1.0 / keep),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, cols), dtype),
        interpret=interp,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    flat = out.reshape(-1)[:total]
    return jax.lax.stop_gradient(flat.reshape(shape))


def dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Dropout via the mask kernel: x * mask (autodiff-safe)."""
    return x * dropout_mask(seed, x.shape, rate, dtype=x.dtype)


def dropout_reference(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """XLA threefry dropout (flax nn.Dropout math) for parity/benchmarks."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
