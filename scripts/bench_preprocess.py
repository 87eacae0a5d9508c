"""End-to-end preprocess wall-clock: files -> HDF5 (round-3 verdict #4).

Measures THIS framework's data/preprocess.py:get_data (threaded decode-ahead
+ batched device STFT) against an emulation of the reference's end-to-end
pipeline (reference preprocessing/preprocess.py:163-232) on the same
synthetic dataset dir. The reference's literal code cannot run here
(librosa / pretty_midi are not installed in this image); the emulation
preserves its structure — fully serial per-file decode, PER-CHUNK host
STFT (reference preprocess.py:60-77), identical HDF5 writes — with the
host DSP supplied by the in-repo NumPy goldens (ops/reference.py), which
the baseline methodology already documents as an upper bound on librosa's
speed for this workload (BASELINE.md). MIDI parse + WAV decode use the
same first-party code on BOTH sides, so the measured difference isolates
what the frameworks actually do differently: where the STFT runs and what
overlaps what.

Usage (real TPU): python scripts/bench_preprocess.py [--songs N]
    [--duration S] [--styles cuba upright] [--out PREPROCESS_BENCH.json]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def reference_get_data_emulated(data_dir, outpath, song_ids, styles, hp):
    """The reference's get_data loop shape (preprocess.py:163-232): serial
    decode, per-chunk host STFT (preprocess.py:47-77), same HDF5 schema."""
    import h5py

    from ml_music_style_transfer_tpu.data import chunking
    from ml_music_style_transfer_tpu.data import preprocess as pp
    from ml_music_style_transfer_tpu.data.hdf5_store import H5Store
    from ml_music_style_transfer_tpu.ops import reference as npref

    h5pyname = f"{outpath}_train.hdf5"
    with h5py.File(h5pyname, "w") as h5f:
        store = H5Store(h5f)
        for song_id in song_ids:
            roll, onoff = pp.load_midi(data_dir, song_id, hp=hp)
            n = chunking.num_song_chunks(roll.shape[0], hp)
            store.write_pianoroll(chunking.chunk_pianoroll(roll, n, hp),
                                  chunking.chunk_pianoroll(onoff, n, hp))
            for style in styles:
                try:
                    audio = pp.load_audio(data_dir, song_id, style, hp)
                except Exception:
                    continue
                chunks = chunking.chunk_audio(audio, n, hp)
                specs = np.stack([
                    npref.log_power(npref.stft(c, hp.n_fft, hp.ws))
                    for c in chunks]) if n else np.zeros(
                        (0, hp.n_freq_bins, hp.windows_per_chunk), np.float32)
                store.write_spectrum(specs.astype(np.float32), style)
    return h5pyname


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--songs", type=int, default=4)
    ap.add_argument("--duration", type=float, default=90.0,
                    help="seconds of audio per (song, style) file")
    ap.add_argument("--styles", nargs="*", default=["cuba", "upright"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "PREPROCESS_BENCH.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmst_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ml_music_style_transfer_tpu.config import DEFAULT_DSP
    from ml_music_style_transfer_tpu.data import preprocess as pp
    from ml_music_style_transfer_tpu.data.hdf5_store import load_dataset
    from ml_music_style_transfer_tpu.testing import synthetic

    hp = DEFAULT_DSP
    song_ids = [100 + i for i in range(args.songs)]
    work = tempfile.mkdtemp(prefix="bench_pp_")
    try:
        data_dir = os.path.join(work, "data")
        os.makedirs(data_dir)
        log(f"generating {args.songs} songs x {args.styles} "
            f"({args.duration:.0f}s each) ...")
        synthetic.make_dataset_dir(data_dir, song_ids=song_ids,
                                   styles=args.styles,
                                   duration=args.duration, seed=args.seed)
        n_wav_bytes = sum(os.path.getsize(os.path.join(data_dir, f))
                          for f in os.listdir(data_dir) if f.endswith(".wav"))
        log(f"dataset dir: {n_wav_bytes/1e6:.0f} MB of WAVs")

        # --- ours, cold (includes STFT compile) then warm ----------------
        t0 = time.perf_counter()
        out1 = pp.get_data(data_dir, os.path.join(work, "ours_cold"), "train",
                           song_ids=song_ids, styles=args.styles,
                           stft_backend="device")
        ours_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = pp.get_data(data_dir, os.path.join(work, "ours"), "train",
                           song_ids=song_ids, styles=args.styles,
                           stft_backend="device")
        ours = time.perf_counter() - t0
        t0 = time.perf_counter()
        pp.get_data(data_dir, os.path.join(work, "ours_serial"), "train",
                    song_ids=song_ids, styles=args.styles, prefetch=False,
                    stft_backend="device")
        ours_serial = time.perf_counter() - t0

        # host STFT backend: no accelerator round-trip (the win on slow
        # host<->device links, where the spec download dominates)
        t0 = time.perf_counter()
        pp.get_data(data_dir, os.path.join(work, "ours_host"), "train",
                    song_ids=song_ids, styles=args.styles,
                    stft_backend="host")
        ours_host = time.perf_counter() - t0

        # auto backend (the round-5 default): probe the link once, pick the
        # measured-faster side; must land within noise of the best manual
        # choice (the probe itself is inside the timed wall, honestly)
        pp._AUTO_BACKEND_CACHE.clear()
        t0 = time.perf_counter()
        pp.get_data(data_dir, os.path.join(work, "ours_auto"), "train",
                    song_ids=song_ids, styles=args.styles,
                    stft_backend="auto")
        ours_auto = time.perf_counter() - t0
        import jax as _jax
        auto_resolved = pp._AUTO_BACKEND_CACHE.get(
            _jax.devices()[0].platform, "device")
        best_manual = min(ours, ours_host)
        assert ours_auto <= 1.25 * best_manual, (
            f"auto ({ours_auto:.1f}s via {auto_resolved!r}) lost to the best "
            f"manual backend ({best_manual:.1f}s)")
        log(f"auto backend resolved to {auto_resolved!r}: {ours_auto:.1f}s "
            f"(best manual {best_manual:.1f}s)")

        # resident-training build: raw audio only, NO stored spectrograms
        # (device_store recomputes them on-device every step)
        t0 = time.perf_counter()
        pp.get_data(data_dir, os.path.join(work, "ours_skip"), "train",
                    song_ids=song_ids, styles=args.styles,
                    store_audio=True, write_spectrum=False)
        ours_skip = time.perf_counter() - t0

        # --- reference-shaped emulation (host NumPy, serial) -------------
        t0 = time.perf_counter()
        ref_out = reference_get_data_emulated(
            data_dir, os.path.join(work, "ref"), song_ids, args.styles, hp)
        ref = time.perf_counter() - t0

        # same content out of both pipelines (spot-check)
        d_ours, d_ref = load_dataset(out2), load_dataset(ref_out)
        assert d_ours["pianoroll"].shape == d_ref["pianoroll"].shape
        key = f"spec_{args.styles[0]}"
        n_chunks = d_ours[key].shape[0]
        spec_err = float(np.max(np.abs(d_ours[key] - d_ref[key])))
        log(f"content check: {n_chunks} chunks, max |spec diff| = {spec_err:.2e}")

        result = {
            "songs": args.songs,
            "styles": args.styles,
            "duration_s_per_file": args.duration,
            "n_chunks": int(n_chunks),
            "frames_total": int(n_chunks * hp.windows_per_chunk
                                * len(args.styles)),
            "ours_cold_s": round(ours_cold, 2),
            "ours_warm_s": round(ours, 2),
            "ours_warm_serial_s": round(ours_serial, 2),
            "ours_host_backend_s": round(ours_host, 2),
            "ours_auto_backend_s": round(ours_auto, 2),
            "auto_resolved_backend": auto_resolved,
            "auto_vs_best_manual": round(ours_auto / best_manual, 2),
            "ours_skip_spectrum_s": round(ours_skip, 2),
            "reference_emulated_s": round(ref, 2),
            "speedup_warm": round(ref / ours, 2),
            "speedup_cold": round(ref / ours_cold, 2),
            "speedup_host_backend": round(ref / ours_host, 2),
            "speedup_skip_spectrum": round(ref / ours_skip, 2),
            "prefetch_gain": round(ours_serial / ours, 2),
            "spec_max_abs_diff": spec_err,
            "note": ("reference side is the reference's loop shape "
                     "(serial decode + per-chunk host STFT, "
                     "preprocess.py:60-77) with in-repo NumPy DSP standing "
                     "in for librosa (not installed; upper bound per "
                     "BASELINE.md methodology); decode/MIDI code identical "
                     "on both sides"),
        }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
