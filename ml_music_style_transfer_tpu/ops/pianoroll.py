"""On-device piano-roll ops (JAX / XLA).

TPU-side counterparts of midi/pianoroll.py for when rolls are built or
transformed inside jitted pipelines:
  - ``onset_offset``: the vectorized frame-diff replacing the reference's
    O(T) Python loop (preprocessing/preprocess.py:150-155)
  - ``notes_to_pianoroll``: scatter-based roll rasterization from padded
    note-event arrays (static shapes; masked for unused slots)

Shapes use (T, 128); 128 pitches land exactly on the TPU lane width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_PITCHES = 128


@jax.jit
def binarize(roll: jnp.ndarray) -> jnp.ndarray:
    """roll[nonzero] = 1 (reference preprocess.py:148)."""
    return (roll != 0).astype(roll.dtype)


@jax.jit
def onset_offset(binary_roll: jnp.ndarray) -> jnp.ndarray:
    """(..., T, 128) binarized roll -> onset/offset matrix in {-1, 0, +1}.

    Frame 0: +1 where active. Frame i>0: +1 on note-on edge, -1 on note-off
    edge. Bit-identical to midi.pianoroll.onset_offset / the reference loop.
    """
    active = binary_roll != 0
    prev = jnp.pad(active[..., :-1, :], [(0, 0)] * (active.ndim - 2) + [(1, 0), (0, 0)])
    onoff = jnp.where(active & ~prev, 1.0, 0.0) + jnp.where(~active & prev, -1.0, 0.0)
    return onoff.astype(binary_roll.dtype)


@functools.partial(jax.jit, static_argnames=("fs", "length"))
def notes_to_pianoroll(
    pitches: jnp.ndarray,
    velocities: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    fs: int,
    length: int,
) -> jnp.ndarray:
    """Rasterize padded note arrays into a (length, 128) velocity roll.

    Inputs are fixed-size arrays (pad unused slots with velocity 0). A note
    covers frames [int(start*fs), int(end*fs)), matching
    midi.pianoroll.notes_to_pianoroll. Implemented as a dense interval mask
    (frames x notes) followed by a (frames x notes) @ (notes x 128) matmul —
    scatter-free and MXU-friendly.
    """
    s = jnp.floor(starts * fs).astype(jnp.int32)
    e = jnp.floor(ends * fs).astype(jnp.int32)
    frames = jax.lax.broadcasted_iota(jnp.int32, (length, pitches.shape[0]), 0)
    inside = (frames >= s[None, :]) & (frames < e[None, :])  # (T, n_notes)
    contrib = inside.astype(jnp.float32) * velocities[None, :].astype(jnp.float32)
    onehot = jax.nn.one_hot(pitches, N_PITCHES, dtype=jnp.float32)  # (n_notes, 128)
    return jnp.dot(contrib, onehot, preferred_element_type=jnp.float32)
