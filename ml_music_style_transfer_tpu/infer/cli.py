"""Inference CLI — the reference's inference.py entry point, same flags.

    python -m ml_music_style_transfer_tpu.infer.cli \
        -exp-name NAME -midi-source PATH -audio-source PATH [--width-mult F]

Reference CLI: model/inference.py:112-124 (exp dir resolved as
./experiments/{exp_name}; checkpoint picked via hyperparams.json best_epoch).
"""
from __future__ import annotations

import argparse
import os

from ..config import ModelConfig
from .synthesize import AudioSynthesizer


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-exp-name", dest="exp_name", type=str, required=True)
    p.add_argument("-midi-source", dest="midi_source", type=str, required=True)
    p.add_argument("-audio-source", dest="audio_source", type=str, required=True)
    p.add_argument("--width-mult", type=float, default=1.0,
                   help="must match the trained model's width")
    p.add_argument("--n-iter", type=int, default=300, help="Griffin-Lim iterations")
    p.add_argument("--compat-mbr-noop", action="store_true",
                   help="reproduce the reference MBRBlock's literal 2*x "
                        "behavior (forced automatically for .tar checkpoints)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="explicit checkpoint path (.msgpack or reference .tar); "
                        "default resolves via hyperparams.json best_epoch")
    p.add_argument("--use-ema", action="store_true",
                   help="serve the EMA-smoothed weights an --ema-decay "
                        "training run checkpointed (ema_params tree)")
    p.add_argument("--cond-mode", choices=("aligned", "center"), default="aligned",
                   help="'aligned': each MIDI tile conditions on the audio at "
                        "its own time position (whole-clip semantics, as the "
                        "reference feeds the full spec, inference.py:55-62); "
                        "'center': one center 5s crop broadcast to all tiles")
    args = p.parse_args(argv)

    from ..utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # serving restarts skip ~8 min compiles

    exp_dir = os.path.join(os.path.abspath("./experiments"), args.exp_name)
    synth = AudioSynthesizer(
        exp_dir, args.midi_source, args.audio_source,
        model_cfg=ModelConfig(width_mult=args.width_mult,
                              compat_mbr_noop=args.compat_mbr_noop),
        checkpoint_path=args.checkpoint,
        use_ema=args.use_ema,
    )
    outs = synth.inference(n_iter=args.n_iter, cond_mode=args.cond_mode)
    for o in outs:
        print(f"wrote {o}")


if __name__ == "__main__":
    main()
