"""Opt-in REAL-DATA readiness check: preprocess -> train -> synthesize.

All quality evidence in this repo is otherwise synthetic (MusicNet is not
shipped in either repo — reference preprocessing/preprocess.py:28-34
hard-codes its song ids against a local download). This script makes
real-data readiness a TESTED property: point it at a MusicNet-style
directory ({id}*mixcraft.mid + {id}_..._{style}.wav, the reference's naming
contract) and it will

  1. preprocess the directory end to end (same pipeline as the CLI),
  2. assert the chunk-alignment/shape contracts (SURVEY §2 tensor table),
  3. run N train steps and require the loss to descend,
  4. synthesize one clip (forward + Griffin-Lim) and report L1 / GL
     spectral error,

writing a JSON report to stdout (and REAL_DATA_CHECK.json next to the repo
root). WITHOUT a data dir it skips cleanly (exit 0, "skipped": true) so CI
and fresh checkouts are unaffected.

Usage:
    python scripts/real_data_check.py --data-dir /path/to/musicnet_styles \
        [--width-mult 0.25] [--steps 60] [--batch-size 4] [--n-iter 100]
    # or: MMST_REAL_DATA_DIR=/path python scripts/real_data_check.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=os.environ.get("MMST_REAL_DATA_DIR"),
                    help="MusicNet-style dir of {id}*mixcraft.mid + "
                         "{id}_..._{style}.wav; omit to skip cleanly")
    ap.add_argument("--width-mult", type=float, default=0.25,
                    help="model width for the smoke-train (1.0 = flagship; "
                         "0.25 keeps the check minutes-scale on one chip)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-iter", type=int, default=100)
    ap.add_argument("--max-chunks-per-song", type=int, default=100)
    ap.add_argument("--workdir", default="/tmp/mmst_real_data_check")
    ap.add_argument("--out", default=None,
                    help="JSON report path (default REAL_DATA_CHECK.json at "
                         "the repo root)")
    args = ap.parse_args(argv)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REAL_DATA_CHECK.json")

    if not args.data_dir or not os.path.isdir(args.data_dir):
        result = {"skipped": True,
                  "reason": "no --data-dir / MMST_REAL_DATA_DIR supplied "
                            "(MusicNet is not shipped with this repo)"}
        print(json.dumps(result))
        return result

    import jax
    import jax.numpy as jnp

    from ml_music_style_transfer_tpu.config import (DEFAULT_DSP, ModelConfig,
                                                    TrainConfig)
    from ml_music_style_transfer_tpu.data import preprocess as pp
    from ml_music_style_transfer_tpu.data.dataset import ChunkDataset
    from ml_music_style_transfer_tpu.ops import griffinlim as jgl
    from ml_music_style_transfer_tpu.ops import stft as jstft
    from ml_music_style_transfer_tpu.train.loop import Trainer, device_prefetch

    hp = DEFAULT_DSP
    song_ids = pp.discover_song_ids(args.data_dir)
    styles = pp.discover_styles(args.data_dir)
    if not song_ids or not styles:
        result = {"skipped": True,
                  "reason": f"{args.data_dir} has no {{id}}*mixcraft.mid / "
                            f"{{id}}_*_{{style}}.wav pairs "
                            f"(ids={song_ids}, styles={styles})"}
        print(json.dumps(result))
        return result
    log(f"discovered songs={song_ids} styles={styles}")

    # 1) preprocess (the real pipeline, reference preprocess.py:163-232)
    os.makedirs(args.workdir, exist_ok=True)
    ds_base = os.path.join(args.workdir, "ds")
    t0 = time.perf_counter()
    pp.get_data(args.data_dir, ds_base, "train", song_ids=song_ids,
                styles=styles, max_chunks=args.max_chunks_per_song)
    t_pre = time.perf_counter() - t0

    # 2) alignment/shape contracts (SURVEY §2 tensor table)
    ds = ChunkDataset(ds_base + "_train.hdf5")
    assert ds.n_data > 0, "preprocessing produced zero chunks"
    assert ds.pianoroll.shape[1:] == (hp.windows_per_chunk, 128), ds.pianoroll.shape
    assert ds.onoff.shape == ds.pianoroll.shape
    for s, spec in ds.specs.items():
        # ChunkDataset keeps specs time-major (N, 860, 1025)
        assert spec.shape == (ds.n_data, hp.windows_per_chunk, hp.n_freq_bins), (
            s, spec.shape)
    assert set(np.unique(ds.pianoroll)).issubset({0.0, 1.0})
    log(f"contracts OK: {ds.n_data} chunks x {len(ds.specs)} styles "
        f"({t_pre:.1f}s preprocess)")

    # 3) N train steps: loss must descend on real data
    cfg = ModelConfig(width_mult=args.width_mult)
    tr = Trainer(cfg, TrainConfig(batch_size=args.batch_size,
                                  learning_rate=args.lr, seed=0))
    params, opt_state = tr.init_state(0)
    rng = jax.random.PRNGKey(0)
    losses = []
    t0 = time.perf_counter()
    while len(losses) < args.steps:
        batches = device_prefetch(
            ds.epoch_batches(args.batch_size, shuffle=True, drop_last=True),
            tr._batch_sharding)
        for batch in batches:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = tr.train_step(params, opt_state, batch, sub)
            losses.append(loss)
            if len(losses) >= args.steps:
                break
    losses = [float(x) for x in losses]
    t_train = time.perf_counter() - t0
    k = max(1, args.steps // 10)
    first, last = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
    log(f"train L1: first{k}={first:.4f} last{k}={last:.4f} ({t_train:.1f}s)")

    # 4) one synthesis: forward a real chunk + Griffin-Lim floor
    style = sorted(ds.specs)[0]
    midi = jnp.asarray(ds.pianoroll[:1])
    onoff = jnp.asarray(ds.onoff[:1])
    cond = jnp.asarray(ds.specs[style][:1])  # already time-major (1,860,1025)
    pred = tr.model.apply(params, midi, cond, onoff, deterministic=True)[0]
    spec = jnp.swapaxes(pred.astype(jnp.float32), -1, -2)  # (1025, 860)
    wav = jgl.griffinlim_from_log_power(spec, key=jax.random.PRNGKey(0),
                                        n_iter=args.n_iter)
    wav_h = np.asarray(wav)
    finite = bool(np.isfinite(wav_h).all()) and float(np.abs(wav_h).max()) > 0
    got = np.asarray(jstft.log_power_stft(wav[: hp.samples_per_chunk],
                                          hp.n_fft, hp.ws))
    mag_pred = np.sqrt(np.expm1(np.clip(np.asarray(spec), 0, 20)))
    mag_got = np.sqrt(np.expm1(np.clip(got[:, : mag_pred.shape[1]], 0, 20)))
    gl_rel = float(np.linalg.norm(mag_got - mag_pred)
                   / max(np.linalg.norm(mag_pred), 1e-9))
    log(f"synthesis: finite={finite} GL rel={gl_rel:.3f}")

    result = {
        "skipped": False,
        "data_dir": os.path.abspath(args.data_dir),
        "songs": song_ids,
        "styles": styles,
        "n_chunks": int(ds.n_data),
        "preprocess_sec": round(t_pre, 2),
        "width_mult": args.width_mult,
        "steps": args.steps,
        "train_l1_first": round(first, 4),
        "train_l1_last": round(last, 4),
        "train_sec": round(t_train, 2),
        "gl_rel_err": round(gl_rel, 4),
        "synth_finite": finite,
        "passed": bool(last < first and finite and gl_rel < 0.8),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
