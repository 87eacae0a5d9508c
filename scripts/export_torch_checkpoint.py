"""Export a trained experiment to the reference's .tar checkpoint format.

    python scripts/export_torch_checkpoint.py -exp-name NAME [--epoch N] \
        [--use-ema] [--out PATH]

Resolves the experiment's best epoch via hyperparams.json (the reference's
own contract, model/inference.py:22-29), converts the flax params with
compat/torch_export.py, and writes checkpoint-{epoch}.tar loadable by the
unmodified reference model/inference.py. Only full-width (width_mult=1.0)
experiments are reference-shaped; anything else fails the reference's
strict load with a shape error.

End-to-end acceptance: scripts/verify_torch_import.py --export.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-exp-name", dest="exp_name", required=True)
    ap.add_argument("--exp-root", default="./experiments")
    ap.add_argument("--epoch", type=int, default=None,
                    help="checkpoint epoch (default: hyperparams.json best_epoch)")
    ap.add_argument("--use-ema", action="store_true",
                    help="export the EMA-smoothed weights (ema_params tree)")
    ap.add_argument("--out", default=None,
                    help="output path (default: {exp_dir}/checkpoint-{epoch}.tar)")
    ap.add_argument("--width-mult", type=float, default=1.0,
                    help="the experiment's width (restore template). Only "
                         "1.0 yields a tar the reference can load; other "
                         "widths still round-trip through this framework's "
                         "own importer")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side file conversion
    import jax.numpy as jnp
    import numpy as np

    from ml_music_style_transfer_tpu.compat import save_reference_checkpoint
    from ml_music_style_transfer_tpu.config import ModelConfig, DEFAULT_DSP
    from ml_music_style_transfer_tpu.models import PerformanceNet
    from ml_music_style_transfer_tpu.train import checkpoint as ckpt

    exp_dir = os.path.join(os.path.abspath(args.exp_root), args.exp_name)
    if args.epoch is not None:
        path, epoch = ckpt.checkpoint_path(exp_dir, args.epoch), args.epoch
        if not os.path.exists(path):
            path = ckpt.sharded_checkpoint_path(exp_dir, args.epoch)
    else:
        path, epoch = ckpt.best_checkpoint(exp_dir)

    key = "ema_params" if args.use_ema else "params"
    if path.endswith(".orbax"):
        params = ckpt.restore_params_sharded_host(path, key=key)
    else:
        cfg = ModelConfig(width_mult=args.width_mult)
        model = PerformanceNet(cfg)
        t = DEFAULT_DSP.windows_per_chunk
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, t, cfg.start_channels), jnp.float32),
            jnp.zeros((1, t, cfg.start_audio_channels), jnp.float32),
            jnp.zeros((1, t, cfg.start_channels), jnp.float32))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template)
        try:
            params = ckpt.restore_checkpoint(path, {key: template})[key]
        except (KeyError, ValueError) as e:
            if args.use_ema:
                raise SystemExit(
                    f"checkpoint {path} has no 'ema_params' tree — was "
                    "--ema-decay set during training?") from e
            raise
    out = args.out or os.path.join(exp_dir, f"checkpoint-{epoch}.tar")
    save_reference_checkpoint(out, params, epoch=epoch)
    print(f"wrote {out} (epoch {epoch}{', EMA weights' if args.use_ema else ''})")


if __name__ == "__main__":
    main()
