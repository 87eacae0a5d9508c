"""Measure the reference implementation's CPU throughput -> BASELINE_MEASURED.json.

The reference publishes no benchmarks (BASELINE.md), so this script
establishes them by running the reference's OWN code (imported read-only
from /root/reference — not copied) on this machine's CPU:

  1. train step: PerformanceNet fwd+bwd+Adam at the reference default
     hyperparameters (L1 loss, lr=1e-3; model/train.py:125-149). Measured at
     batch 1 and normalized to spectrogram-frames/sec (CPU conv cost scales
     ~linearly in batch here).
  2. preprocessing: per-chunk log-power STFT (preprocess.py:47-57 semantics)
     via the in-repo NumPy golden implementation (librosa itself is not
     installed; the NumPy path is an upper bound on librosa's speed for this
     workload since both are single-threaded C FFTs).
  3. Griffin-Lim 300 iterations on a 10 s clip, host CPU (inference.py:105-110).

Usage: python scripts/measure_reference_baseline.py [--train-steps N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ml_music_style_transfer_tpu.ops import reference as npref  # noqa: E402


def measure_train_step(steps: int) -> dict:
    import torch

    sys.path.insert(0, "/root/reference/model")
    from model import PerformanceNet  # the reference's own code, read-only

    model = PerformanceNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.L1Loss()
    B, T = 1, 860
    x_midi = torch.randn(B, 128, T)
    x_onoff = torch.randn(B, 128, T)
    x_audio = torch.randn(B, 1025, T)
    target = torch.randn(B, 1025, T)
    times = []
    for i in range(steps + 1):
        t0 = time.perf_counter()
        opt.zero_grad()
        loss = loss_fn(model(x_midi, x_audio, x_onoff), target)
        loss.backward()
        opt.step()
        dt = time.perf_counter() - t0
        if i > 0:  # skip warmup
            times.append(dt)
        print(f"ref train step {i}: {dt:.1f}s", file=sys.stderr, flush=True)
    step = float(np.median(times)) if times else dt
    return {"reference_train_step_sec_cpu_b1": step,
            "reference_train_frames_per_sec_cpu": B * T / step}


def measure_preprocess() -> dict:
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal(219904).astype(np.float32)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        npref.log_power(npref.stft(chunk, 2048, 256))
    dt = (time.perf_counter() - t0) / n
    return {"reference_preprocess_sec_per_chunk_cpu": dt,
            "reference_preprocess_frames_per_sec_cpu": 860 / dt}


def measure_griffinlim() -> dict:
    rng = np.random.default_rng(0)
    n_frames = 1 + (10 * 44100) // 256
    mag = np.abs(rng.standard_normal((1025, n_frames)))
    t0 = time.perf_counter()
    npref.griffinlim(mag, n_iter=300, hop_length=256)
    dt = time.perf_counter() - t0
    return {"reference_griffinlim_sec_per_10s_clip_cpu": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=2)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    out = {"note": "reference measured on this machine's CPU (see script docstring)",
           "cpu_count": os.cpu_count()}
    out.update(measure_preprocess())
    print("preprocess done", file=sys.stderr)
    out.update(measure_griffinlim())
    print("griffinlim done", file=sys.stderr)
    if not args.skip_train:
        out.update(measure_train_step(args.train_steps))
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
