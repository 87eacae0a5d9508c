"""Pallas TPU kernels: fused Griffin-Lim consistency "glue".

Each Griffin-Lim iteration (ops/griffinlim.py; reference
model/inference.py:105-110 runs 300 of them) is

    irfft -> [window -> overlap-add -> NOLA normalize -> center crop ->
              reflect pad -> re-frame -> window] -> rfft

Under XLA the bracketed glue is ~10 separate HLOs, each materializing a
frames-sized (n_frames, 2048) or signal-sized buffer in HBM. These two
kernels compute the whole bracket with one read of the irfft frames and one
write of the rfft input:

  - ``_ola_kernel``: window multiply + overlap-add + NOLA, exploiting the
    TPU grid's sequential execution to carry the 7-block overlap tail
    between programs in VMEM scratch (no atomics, no scatter). Emits the
    overlap-added signal as (blocks, hop) rows — only ~1/8 the frame bytes.
  - ``_frame_kernel``: re-frames the signal into windowed 2048-sample rows
    for the rfft; the (small) signal lives fully in VMEM and each output
    frame concatenates 8 hop-blocks with shifted dynamic slices.

Center-crop + reflect-pad cancel exactly for interior frames (centered
STFT/iSTFT with the same n_fft); the first/last 8 frames are overwritten by
an exact (cheap) XLA computation in the wrapper.

hop must divide n_fft (reference uses 2048/256 = 8x overlap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # n_fft // hop overlap factor (2048 / 256)


def _ola_kernel(f_ref, win_ref, inv_ref, o_ref, carry_ref, *, t_tile: int):
    # All sublane offsets here are value-level (in-register shifts), never
    # misaligned memory indices — Mosaic requires dim-0 memory indices to be
    # provable multiples of 8.
    i = pl.program_id(0)
    fw = f_ref[:] * win_ref[0][None, :]          # (T, n_fft)
    hop = o_ref.shape[-1]
    pieces = fw.reshape(t_tile, R, hop)
    # acc[m] = sum_j pieces[m - j, j]; shifted adds via pltpu.roll (canonical
    # layouts; an asymmetric pad would carry sublane offsets Mosaic rejects)
    acc = jnp.zeros((t_tile + R, hop), jnp.float32)
    for j in range(R):
        ppad = jnp.pad(pieces[:, j, :], ((0, R), (0, 0)))  # zero tail >= R
        acc = acc + pltpu.roll(ppad, shift=j, axis=0)
    old_carry = carry_ref[:]
    carry_ref[:] = acc[t_tile : t_tile + R, :]
    head = acc[0:t_tile, :]

    @pl.when(i > 0)
    def _add_prev_tail():
        o_ref[:] = (head + jnp.pad(old_carry, ((0, t_tile - R), (0, 0)))) * inv_ref[:]

    @pl.when(i == 0)
    def _first():
        o_ref[:] = head * inv_ref[:]


def _frame_kernel(y_ref, win_ref, o_ref, *, t_tile: int):
    base = pl.program_id(0) * t_tile  # multiple of t_tile -> 8-aligned
    blk = y_ref[pl.ds(base, t_tile + R), :]  # one aligned load, halo included
    # pltpu.roll keeps every shifted view in the canonical layout (a raw
    # blk[j:j+t] slice carries a sublane offset Mosaic cannot concatenate)
    rows = t_tile + R
    cols = [pltpu.roll(blk, shift=(rows - j) % rows, axis=0)[0:t_tile, :]
            for j in range(R)]
    o_ref[:] = jnp.concatenate(cols, axis=-1) * win_ref[0][None, :]


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def _glue_core(frames, window, inv_blocks, t_tile: int = 256, interpret: bool = False):
    """frames (nf, n_fft) f32 -> (G (nf_pad, n_fft), y (rows_y, hop))."""
    nf, n_fft = frames.shape
    hop = n_fft // R
    rows_out = _pad_to(nf, t_tile)
    rows_y = rows_out + t_tile  # covers n_blocks = nf + R - 1, plus B's halo
    fpad = jnp.pad(frames, ((0, rows_y - nf), (0, 0)))
    invp = jnp.pad(inv_blocks, ((0, rows_y - inv_blocks.shape[0]), (0, 0)))
    win2d = window.reshape(1, n_fft)
    interp = pltpu.InterpretParams() if interpret else False

    y = pl.pallas_call(
        functools.partial(_ola_kernel, t_tile=t_tile),
        grid=(rows_y // t_tile,),
        in_specs=[
            pl.BlockSpec((t_tile, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, hop), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tile, hop), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_y, hop), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, hop), jnp.float32)],
        interpret=interp,
    )(fpad, win2d, invp)

    g = pl.pallas_call(
        functools.partial(_frame_kernel, t_tile=t_tile),
        grid=(rows_out // t_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full y resident in VMEM
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_tile, n_fft), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, n_fft), jnp.float32),
        interpret=interp,
    )(y, win2d)
    return g, y


def supported(n_frames: int, n_fft: int, hop: int, t_tile: int = 256) -> bool:
    """Shape guard: 8x overlap, enough frames for the edge fixup, and the
    overlap-added signal must fit in VMEM for the frame kernel."""
    rows_y = _pad_to(n_frames, t_tile) + t_tile
    return (
        n_fft % hop == 0
        and n_fft // hop == R
        and n_frames >= 3 * R
        and rows_y * hop * 4 <= 12 * 2**20
    )


def gl_consistency_frames(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    inv_blocks: jnp.ndarray,
    t_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused GL glue: irfft frames -> windowed rfft input frames.

    Args:
      frames: (n_frames, n_fft) float32 — raw irfft output (pre-window).
      window: (n_fft,) float32 analysis/synthesis window.
      inv_blocks: (n_blocks, hop) float32 — 1/window_sumsquare reshaped to
        hop-blocks (n_blocks = n_frames + R - 1); zeros where wss ~ 0.

    Returns (n_frames, n_fft) float32, bit-comparable to
    stft-glue(istft-glue(frames)) of ops/stft.py (interior exactly; the 8
    edge frames at each end are computed by the exact XLA path).
    """
    nf, n_fft = frames.shape
    hop = n_fft // R
    g, y = _glue_core(frames, window, inv_blocks, t_tile, interpret)
    g = g[:nf]

    # --- exact edge frames (reflect padding at the clip boundaries) -------
    n_blocks = nf + R - 1
    lpad = n_fft // 2
    length = hop * (nf - 1)
    y_flat = y.reshape(-1)[: n_blocks * hop]
    yc = y_flat[lpad : lpad + length]  # the cropped signal istft would emit
    span = n_fft + (R - 1) * hop  # samples covering 8 hop-spaced frames
    # padded-signal prefix y_p[0:span]: frames 0..7 start at local k*hop
    head = jnp.pad(yc[: span - lpad], (lpad, 0), mode="reflect")
    # padded-signal suffix y_p[(nf-8)*hop:]: frames nf-8..nf-1, local k*hop
    tail = jnp.pad(yc[-(span - lpad) :], (0, lpad), mode="reflect")

    def frame8(sig):
        idx = np.arange(R)[:, None] * hop + np.arange(n_fft)[None, :]
        return sig[idx] * window[None, :]

    head_f = frame8(head)
    tail_f = frame8(tail)
    g = jnp.concatenate([head_f, g[R : nf - R], tail_f], axis=0)
    return g
