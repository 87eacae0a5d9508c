"""Export StableHLO deployment artifacts (forward + Griffin-Lim + serving).

The reference deploys Python model code + a torch checkpoint; this writes
versioned, runtime-portable StableHLO programs instead (jax.export) that any
PJRT host — including Python-less C++ servers — can load. Params are
arguments, so one export serves every checkpoint of the model config.
The ``serving`` artifact is the FUSED end-to-end program (cond STFT + tile
gather + forward + crossfade blend + Griffin-Lim); ``--serving-n-tiles 0``
skips it.

Usage:
    python scripts/export_stablehlo.py --out DIR [--width-mult 1.0]
        [--t 860] [--batch 1] [--n-iter 300] [--frames 860]
        [--serving-n-tiles 8] [--serving-audio-seconds 30]
        [--platforms tpu cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--compat-mbr-noop", action="store_true")
    ap.add_argument("--t", type=int, default=860)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n-iter", type=int, default=300)
    ap.add_argument("--frames", type=int, default=860)
    ap.add_argument("--serving-n-tiles", type=int, default=8,
                    help="MIDI tile count baked into the fused serving "
                         "artifact (0 skips it)")
    ap.add_argument("--serving-audio-seconds", type=float, default=30.0,
                    help="timbre-audio length baked into the fused serving "
                         "artifact")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="target platform(s), e.g. 'tpu' or 'tpu cpu'; "
                         "default = the current backend")
    args = ap.parse_args()

    from ml_music_style_transfer_tpu.compat import stablehlo_export as she
    from ml_music_style_transfer_tpu.config import ModelConfig

    cfg = ModelConfig(width_mult=args.width_mult,
                      compat_mbr_noop=args.compat_mbr_noop)
    paths = she.write_artifacts(
        args.out, cfg, t=args.t, batch=args.batch, n_iter=args.n_iter,
        frames=args.frames, platforms=args.platforms,
        serving_n_tiles=args.serving_n_tiles,
        serving_audio_samples=int(args.serving_audio_seconds * 44100))
    for name, p in paths.items():
        print(f"{name}: {p} ({os.path.getsize(p)} bytes)")


if __name__ == "__main__":
    main()
