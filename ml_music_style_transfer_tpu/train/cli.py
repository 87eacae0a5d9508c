"""Training CLI — the reference's train.py entry point, same flags.

    python -m ml_music_style_transfer_tpu.train.cli \
        -data-dir PATH_BASENAME -exp-name NAME [-epochs N] [-test-freq N] \
        [--batch-size N] [--n-train-read N] [--n-test-read N] [--resume] \
        [--width-mult F] [--mesh-data N] [--mesh-model N] [--spectral-loss W]

Reference CLI: model/train.py:211-220.
"""
from __future__ import annotations

import argparse

from ..config import ModelConfig, TrainConfig
from ..parallel import mesh as pmesh
from .loop import Trainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-data-dir", dest="data_dir", type=str, required=True,
                   help="dataset basename; _train.hdf5/_test.hdf5 are appended")
    p.add_argument("-epochs", dest="epochs", type=int, default=1)
    p.add_argument("-test-freq", dest="test_freq", type=int, default=1)
    p.add_argument("-exp-name", dest="exp_name", type=str, default="piano_test")
    p.add_argument("--n-train-read", type=int, default=None)
    p.add_argument("--n-test-read", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--width-mult", type=float, default=1.0,
                   help="channel-width multiplier (1.0 = reference full size)")
    p.add_argument("--mesh-data", type=int, default=1, help="data-parallel axis size")
    p.add_argument("--mesh-model", type=int, default=1, help="tensor-parallel axis size")
    p.add_argument("--spectral-loss", type=float, default=0.0,
                   help="weight of the DDSP-style multi-scale spectral loss")
    p.add_argument("--spectral-loss-mode", choices=("linlog", "log", "direct"),
                   default="linlog",
                   help="spectral-loss variant: linear+log mel terms "
                        "(linlog), log-mel only (log), or multi-scale L1 on "
                        "the log1p outputs with no inversion (direct)")
    p.add_argument("--compat-mbr-noop", action="store_true",
                   help="reproduce the reference MBRBlock no-op/doubling behavior")
    p.add_argument("--debug-nans", action="store_true",
                   help="fail fast on NaN anywhere in jitted computation "
                        "(jax_debug_nans; the numeric sanitizer, SURVEY §5)")
    p.add_argument("--stream-bf16", action="store_true",
                   help="stream host batches as bfloat16 (halves upload bytes on "
                        "low-bandwidth links; use when the dataset exceeds HBM)")
    p.add_argument("--device-resident", action="store_true",
                   help="park the train split in HBM and assemble batches on-device "
                        "(requires preprocessing --store-audio); removes the "
                        "host->device streaming bottleneck")
    p.add_argument("--adam-mu-dtype", choices=("float32", "bfloat16"), default=None,
                   help="Adam first-moment dtype; bfloat16 halves the m-state "
                        "HBM traffic in the optimizer sweep (default float32 "
                        "= exact torch.optim.Adam parity)")
    p.add_argument("--adam-nu-dtype", choices=("float32", "bfloat16"), default=None,
                   help="Adam second-moment dtype; bfloat16 (with "
                        "--adam-mu-dtype bfloat16) cuts the optimizer sweep "
                        "to 20 B/param (train/optim.py adam_compact)")
    p.add_argument("--grads-dtype", choices=("float32", "bfloat16"),
                   default=None,
                   help="gradient transit dtype between backward and the "
                        "optimizer; bfloat16 halves materialized grad-buffer "
                        "HBM traffic (Adam arithmetic stays float32; "
                        "convergence-parity tested)")
    p.add_argument("--grad-clip-norm", type=float, default=None,
                   help="clip the global gradient norm before Adam (off by "
                        "default = reference parity)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup over the first N steps (composes "
                        "with the plateau scheduler)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="track an EMA of the params (e.g. 0.999): eval and "
                        "best-epoch selection use the smoothed weights, "
                        "checkpoints add an ema_params tree, and the infer "
                        "CLI serves it with --use-ema")
    p.add_argument("--store-sharding", choices=("replicated", "data"),
                   default="replicated",
                   help="device-resident store placement on a mesh: "
                        "'replicated' (full copy per device, local gathers) "
                        "or 'data' (rows sharded 1/N per device, GSPMD "
                        "gather collectives; use when the dataset is the "
                        "HBM constraint)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over k microbatches and apply "
                        "the mean every k-th step (effective batch = k x "
                        "batch-size at 1/k the activation memory)")
    p.add_argument("--zero-opt", action="store_true",
                   help="ZeRO-1: shard optimizer state (Adam moments, EMA) "
                        "1/N over the data axes; params stay replicated for "
                        "compute at the cost of one param all-gather per "
                        "step (no-op on a 1-wide data axis)")
    p.add_argument("--ckpt-format", choices=("msgpack", "orbax"), default="msgpack",
                   help="'orbax': async per-shard checkpoint writes + "
                        "restore-into-sharding on resume (no full host "
                        "gather; the right choice on multi-chip meshes)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    from ..utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # restarts/resumes skip the big compile
    if args.debug_nans:
        from ..utils.profiling import enable_nan_debugging

        enable_nan_debugging()
    model_cfg = ModelConfig(width_mult=args.width_mult, compat_mbr_noop=args.compat_mbr_noop)
    train_cfg = TrainConfig(
        epochs=args.epochs, test_freq=args.test_freq, exp_name=args.exp_name,
        batch_size=args.batch_size, learning_rate=args.lr,
        n_train_read=args.n_train_read, n_test_read=args.n_test_read,
        spectral_loss_weight=args.spectral_loss,
        spectral_loss_mode=args.spectral_loss_mode,
        mesh_shape=(args.mesh_data, args.mesh_model),
        adam_mu_dtype=args.adam_mu_dtype,
        adam_nu_dtype=args.adam_nu_dtype,
        grads_dtype=(None if args.grads_dtype == "float32"
                     else args.grads_dtype),
        grad_clip_norm=args.grad_clip_norm,
        warmup_steps=args.warmup_steps,
        ema_decay=args.ema_decay,
        zero_opt=args.zero_opt,
        grad_accum=args.grad_accum,
    )
    mesh = pmesh.make_mesh(args.mesh_data, args.mesh_model) \
        if args.mesh_data * args.mesh_model > 1 else None
    import jax.numpy as jnp

    Trainer(
        model_cfg, train_cfg, mesh=mesh,
        stream_dtype=jnp.bfloat16 if args.stream_bf16 else None,
    ).fit(args.data_dir, resume=args.resume, device_resident=args.device_resident,
          checkpoint_format=args.ckpt_format, store_sharding=args.store_sharding)


if __name__ == "__main__":
    main()
