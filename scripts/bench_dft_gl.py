"""Measured matmul-DFT vs XLA-FFT for the Griffin-Lim inner loop (real TPU).

BASELINE.md evaluated an MXU matmul-DFT replacement for GL's rfft/irfft only
ON PAPER (36 GFLOP/iter at bf16x3 ~ 0.55 ms vs measured 0.64 ms FFTs) and kept
the FFT path. Serving is now GL-bound (969 ms of the 1.26 s serve), so this
script settles it by MEASUREMENT:

  1. per-iteration cost of the GL projection with the FFTs replaced by one
     fused matmul per direction ([Re|Im] packing), at MXU precisions
     bf16 (one pass), f32->HIGH (bf16x3) and f32->HIGHEST (bf16x6);
  2. end-to-end GL quality (spectral convergence ||| stft(y)| - mag|| / ||mag||
     after 300 iterations) for each precision vs the FFT path, on a synthetic
     harmonic 10 s clip — the same measure the quality gate uses.

The DFT pair is exact (up to matmul precision): for real frames x[n] and
one-sided bins X_k (N=2048, bins=1025),
  rfft:  [Re X | Im X] = x @ [cos(2*pi*n*k/N) | -sin(2*pi*n*k/N)]   (N, 2*bins)
  irfft: x = [Re X | Im X] @ [[w_k cos/N], [-w_k sin/N]]            (2*bins, N)
with w_k = 1 for k in {0, N/2} else 2 (hermitian symmetry weights).

Reference cost replaced: librosa.griffinlim on host CPU
(/root/reference/model/inference.py:105-110).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ml_music_style_transfer_tpu.ops import stft as jstft

N_FFT = 2048
HOP = 256
BINS = N_FFT // 2 + 1


def dft_matrices(dtype=np.float32):
    """(fwd (N, 2*bins), inv (2*bins, N)) exact one-sided DFT matmul pair."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(BINS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT  # float64 for exact constants
    cos, sin = np.cos(ang), np.sin(ang)
    fwd = np.concatenate([cos, -sin], axis=1)  # x @ fwd -> [Re | Im]
    w = np.full((BINS,), 2.0)
    w[0] = 1.0
    w[N_FFT // 2] = 1.0
    inv = np.concatenate([(w * cos / N_FFT).T, (-w * sin / N_FFT).T], axis=0)
    return fwd.astype(dtype), inv.astype(dtype)


def gl_project_fft(reim, mag_t):
    """One GL projection (frames, 2*bins) -> (frames, 2*bins), FFT transforms.

    reim packs [Re | Im] along the last axis; mag_t is (frames, bins).
    Same glue as ops/griffinlim.gl_steps' XLA path (window/OLA/NOLA/pad/frame).
    """
    spec = jax.lax.complex(reim[:, :BINS], reim[:, BINS:]) * mag_t
    frames = jnp.fft.irfft(spec, n=N_FFT, axis=-1)
    g = _glue(frames)
    reb = jnp.fft.rfft(g, axis=-1)
    return jnp.concatenate([jnp.real(reb), jnp.imag(reb)], axis=-1)


def make_gl_project_dft(fwd, inv, in_dtype):
    def project(reim, mag_t):
        reim = jnp.concatenate([reim[:, :BINS] * mag_t, reim[:, BINS:] * mag_t],
                               axis=-1)
        frames = jnp.dot(reim.astype(in_dtype), inv,
                         preferred_element_type=jnp.float32)
        g = _glue(frames)
        return jnp.dot(g.astype(in_dtype), fwd,
                       preferred_element_type=jnp.float32)

    return project


def _glue(frames):
    """window -> OLA -> NOLA -> crop -> reflect pad -> frame -> window,
    identical to scripts/profile_gl.py's glue (the non-Pallas XLA path)."""
    n_frames = frames.shape[0]
    window = jnp.asarray(jstft._window_const(N_FFT, N_FFT))
    inv_wss = jnp.asarray(jstft._wss_inv_const(N_FFT, N_FFT, HOP, n_frames))
    y = jstft._overlap_add(frames * window, HOP) * inv_wss
    y = y[N_FFT // 2 : -(N_FFT // 2)]
    y = jnp.pad(y, (N_FFT // 2, N_FFT // 2), mode="reflect")
    return jstft._frame_dense(y, N_FFT, HOP, n_frames) * window


def gl_run(project, mag_t, phase0, n_iter, momentum=0.99):
    """Full momentum GL on the packed [Re|Im] representation."""
    mom = jnp.float32(momentum / (1.0 + momentum))
    eps = jnp.float32(1.1754944e-38)
    ang0 = jnp.concatenate([jnp.cos(phase0), jnp.sin(phase0)], axis=-1)

    def body(_, carry):
        ang, reb_prev = carry
        reb = project(ang, mag_t)
        a = reb - mom * reb_prev
        norm = jnp.sqrt(a[:, :BINS] ** 2 + a[:, BINS:] ** 2) + eps
        ang = jnp.concatenate([a[:, :BINS] / norm, a[:, BINS:] / norm], axis=-1)
        return ang, reb

    ang, _ = jax.lax.fori_loop(0, n_iter, body,
                               (ang0, jnp.zeros_like(ang0)))
    spec = jax.lax.complex(ang[:, :BINS], ang[:, BINS:]) * mag_t
    return jstft.istft(jnp.swapaxes(spec, 0, 1), HOP, N_FFT)


def slope_time(fn, n_lo=3, n_hi=13, warmups=2):
    for _ in range(warmups):
        fn(n_lo)
    fn(n_hi)
    t0 = time.perf_counter(); fn(n_lo); t1 = time.perf_counter()
    fn(n_hi); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def spectral_error(wave, mag):
    reb = jnp.abs(jstft.stft(wave, N_FFT, HOP, N_FFT))
    return float(jnp.linalg.norm(reb - mag) / jnp.linalg.norm(mag))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--n-iter", type=int, default=300)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from ml_music_style_transfer_tpu.testing import synthetic

    notes = synthetic.random_song(np.random.default_rng(1),
                                  duration=args.seconds)
    wave = synthetic.render_notes(notes, style="cuba", duration=args.seconds)
    mag = jnp.abs(jstft.stft(jnp.asarray(wave, jnp.float32), N_FFT, HOP, N_FFT))
    mag_t = jnp.swapaxes(mag, 0, 1)  # (frames, bins)
    n_frames = mag_t.shape[0]
    rng = np.random.default_rng(0)
    phase0 = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (n_frames, BINS)).astype(np.float32))

    fwd32, inv32 = dft_matrices()
    variants = {
        "fft": gl_project_fft,
        "dft_bf16": make_gl_project_dft(jnp.asarray(fwd32, jnp.bfloat16),
                                        jnp.asarray(inv32, jnp.bfloat16),
                                        jnp.bfloat16),
        "dft_f32": make_gl_project_dft(jnp.asarray(fwd32), jnp.asarray(inv32),
                                       jnp.float32),
    }

    results = {"n_frames": int(n_frames), "n_iter": args.n_iter,
               "platform": jax.devices()[0].platform}
    print(f"n_frames={n_frames} platform={jax.devices()[0].platform}")

    for name, project in variants.items():
        run = jax.jit(functools.partial(gl_run, project, mag_t, phase0),
                      static_argnames=("n_iter",))

        def timed(n):
            float(run(n_iter=n)[0])

        t_iter = slope_time(timed)
        wave_out = run(n_iter=args.n_iter)
        err = spectral_error(wave_out, mag)
        results[name] = {"ms_per_iter": t_iter * 1e3, "spectral_err": err}
        print(f"{name:10s}: {t_iter*1e3:7.3f} ms/iter   "
              f"spectral_err@{args.n_iter} = {err:.5f}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    base = results["fft"]
    for name in ("dft_bf16", "dft_f32"):
        r = results[name]
        print(f"{name}: {base['ms_per_iter']/r['ms_per_iter']:.2f}x iter speed, "
              f"err {r['spectral_err']:.5f} vs fft {base['spectral_err']:.5f}")


if __name__ == "__main__":
    main()
