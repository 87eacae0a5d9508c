"""Griffin-Lim cost breakdown on the real TPU (slope-timed).

Times, per GL iteration at the inference shape (10 s clip -> 2150-frame
bucket): the full iteration, rfft-only, irfft-only, and the inter-FFT glue
(window multiply -> overlap-add -> NOLA -> crop -> reflect-pad -> re-frame ->
window). This tells us whether a fused Pallas glue kernel can clear the
>=1.2x bar (VERDICT r1 #5) or the FFTs dominate.

Timing uses the slope method (two different iteration counts, each fenced by
a scalar fetch) because axon's block_until_ready is unreliable (CLAUDE.md).
"""
from __future__ import annotations

import os
import sys
import functools
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ml_music_style_transfer_tpu.ops import stft as jstft


def slope_time(fn, n_lo=3, n_hi=13, warmups=2):
    """Seconds per call via two-point slope; fn(n) runs the op n times."""
    for _ in range(warmups):
        fn(n_lo)
    fn(n_hi)  # compile the high-count variant outside the timed region
    t0 = time.perf_counter(); fn(n_lo); t1 = time.perf_counter()
    fn(n_hi)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def main():
    n_frames = 2150  # 10 s clip bucketed (430-frame buckets)
    n_fft, hop = 2048, 256
    bins = 1 + n_fft // 2
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((bins, n_frames))).astype(np.float32))
    phase = jnp.asarray(rng.uniform(0, 2 * np.pi, (bins, n_frames)).astype(np.float32))
    angles0 = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

    # --- full GL iteration (the body of ops/griffinlim.griffinlim)
    @functools.partial(jax.jit, static_argnames=("n",))
    def gl_iters(angles, n):
        def body(_, ang):
            inv = jstft.istft(mag * ang, hop, n_fft)
            reb = jstft.stft(inv, n_fft, hop, n_fft)
            a = reb - 0.4975 * ang * 0.0  # momentum-free: pure projection cost
            return a / (jnp.abs(a) + 1e-38)
        return jax.lax.fori_loop(0, n, body, angles)

    def run_full(n):
        float(jnp.real(gl_iters(angles0, n))[0, 0])

    # --- irfft-only / rfft-only at the same shapes
    frames = jnp.asarray(rng.standard_normal((n_frames, n_fft)).astype(np.float32))
    spec_f = jnp.fft.rfft(frames, axis=-1)

    @functools.partial(jax.jit, static_argnames=("n",))
    def rfft_iters(x, n):
        def body(_, c):
            return jnp.fft.rfft(jnp.fft.irfft(c, n=n_fft, axis=-1) * 1.000001, axis=-1)
        return jax.lax.scan(lambda c, _: (body(0, c), 0.0), x, None, length=n)[0]

    def run_fft(n):
        float(jnp.real(rfft_iters(spec_f, n))[0, 0])

    # --- glue-only: istft post-irfft + stft pre-rfft, with the FFTs replaced
    # by cheap casts (isolates framing/OLA/window/NOLA/pad data movement)
    window = jnp.asarray(jstft._window_const(n_fft, n_fft))
    inv_wss = jnp.asarray(jstft._wss_inv_const(n_fft, n_fft, hop, n_frames))

    @functools.partial(jax.jit, static_argnames=("n",))
    def glue_iters(fr, n):
        def body(_, f):
            y = jstft._overlap_add(f * window, hop) * inv_wss
            y = y[n_fft // 2 : -(n_fft // 2)]
            y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
            g = jstft._frame_dense(y, n_fft, hop, n_frames) * window
            return g * 1.000001
        return jax.lax.scan(lambda c, _: (body(0, c), 0.0), fr, None, length=n)[0]

    def run_glue(n):
        float(glue_iters(frames, n)[0, 0])

    t_full = slope_time(run_full)
    t_fft = slope_time(run_fft)
    t_glue = slope_time(run_glue)
    print(f"n_frames={n_frames}")
    print(f"full GL iteration : {t_full*1e3:8.3f} ms")
    print(f"irfft+rfft only   : {t_fft*1e3:8.3f} ms")
    print(f"glue only         : {t_glue*1e3:8.3f} ms")
    print(f"residual (mag/div): {(t_full - t_fft - t_glue)*1e3:8.3f} ms")
    print(f"glue share        : {t_glue/t_full*100:5.1f}%")


if __name__ == "__main__":
    main()
