"""End-to-end synthesis (serving) benchmark on the real TPU.

Measures the DEVICE-RESIDENT inference path of AudioSynthesizer — MIDI parse
(host), waveform upload, on-device cond spec + tile gather + forward +
crossfade blend + Griffin-Lim 300, waveform download — for a 30 s clip at
flagship width, steady-state (compile excluded via warm-up runs of the same
bucketed shapes). Reference equivalent: model/inference.py main() (eager CPU
torch + librosa GL). Round-2 measured the host-blend path at 6.7 s/30 s clip
of which ~2.5 s was spectrogram transfers on this ~0.05 GB/s link; the
device-resident path moves only waveforms + int8 MIDI tiles.

Usage: python scripts/bench_inference.py [--width-mult 1.0] [--seconds 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--n-iter", type=int, default=300)
    ap.add_argument("--profile-dir", type=str, default=None,
                    help="write a jax.profiler trace of one steady-state "
                         "synthesis here (view with tensorboard/xprof) — "
                         "localizes the remaining serve time per-op")
    ap.add_argument("--daemon-requests", type=int, default=6,
                    help="measure serve_loop throughput over K requests, "
                         "pipelined (--pipeline-depth 2) vs serial (0); "
                         "0 skips the daemon section")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmst_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ml_music_style_transfer_tpu.config import ModelConfig
    from ml_music_style_transfer_tpu.infer.synthesize import AudioSynthesizer
    from ml_music_style_transfer_tpu.testing import synthetic

    root = "/tmp/bench_infer"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    notes = synthetic.random_song(rng, duration=args.seconds)
    from ml_music_style_transfer_tpu.midi import writer as midi_writer
    from ml_music_style_transfer_tpu.data.audio_io import write_wav
    midi_path = os.path.join(root, "song.mid")
    wav_path = os.path.join(root, "timbre.wav")
    midi_writer.save(midi_path, notes)
    write_wav(wav_path, synthetic.render_notes(notes, "harpsichord",
                                               duration=args.seconds), 44100)

    cfg = ModelConfig(width_mult=args.width_mult)
    from ml_music_style_transfer_tpu.models import PerformanceNet
    model = PerformanceNet(cfg)
    t = 860
    dummy = (jnp.zeros((1, t, 128)), jnp.zeros((1, t, 1025)), jnp.zeros((1, t, 128)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)
    synth = AudioSynthesizer(root, midi_path, wav_path, model_cfg=cfg, params=params)

    def run():
        t0 = time.perf_counter()
        wav = synth.synthesize_waveform(n_iter=args.n_iter)
        _ = float(np.abs(wav).max())
        t1 = time.perf_counter()
        return t1 - t0, wav

    for i in range(4):  # warm-ups (compile + donation relayout) + steady-state
        total, wav = run()
        tag = "compile+run" if i == 0 else "steady"
        print(f"[{tag}] device-resident total {total:6.2f} s "
              f"({args.seconds/total:4.1f}x realtime)", flush=True)
    assert np.all(np.isfinite(wav)) and np.abs(wav).max() > 0

    # phase breakdown (each phase ended by a tiny sync for honest timing;
    # one cold pass first so the probe's scalar-fetch program is compiled)
    spec, t_total = synth._predict_device(midi_path, wav_path)
    _ = float(spec[0, 0])
    t0 = time.perf_counter()
    spec, t_total = synth._predict_device(midi_path, wav_path)
    _ = float(spec[0, 0])
    t1 = time.perf_counter()
    wav = synth.synthesize_waveform(n_iter=args.n_iter)
    t2 = time.perf_counter()
    print(f"[phases] process+forward+blend {t1-t0:5.2f} s | "
          f"full synth (incl. GL{args.n_iter} + download) {t2-t1:5.2f} s",
          flush=True)

    if args.profile_dir:
        try:
            with jax.profiler.trace(args.profile_dir):
                _, wav = run()
            print(f"[profile] trace written to {args.profile_dir}", flush=True)
        except Exception as e:  # the axon PJRT plugin may lack profiling
            print(f"[profile] unavailable on this backend: {e!r}", flush=True)

    if args.daemon_requests > 0:
        # pipelined daemon throughput (round-3 verdict #7): host prep of
        # request N+1 (MIDI parse, WAV decode, upload, dispatch) hides
        # under device GL of request N
        import importlib.util
        import io
        import json as js

        spec_mod = importlib.util.spec_from_file_location(
            "serve", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "serve.py"))
        serve = importlib.util.module_from_spec(spec_mod)
        spec_mod.loader.exec_module(serve)
        K = args.daemon_requests
        payload = "\n".join(js.dumps(
            {"midi": midi_path, "audio": wav_path,
             "out": os.path.join(root, f"out_{i}.wav"),
             "n_iter": args.n_iter}) for i in range(K)) + "\n"

        def run_daemon(depth):
            in_s, out_s = io.StringIO(payload), io.StringIO()
            t0 = time.perf_counter()
            served = serve.serve_loop(
                lambda m, a: AudioSynthesizer(root, m, a, model_cfg=cfg,
                                              params=params),
                in_s, out_s, pipeline_depth=depth)
            dt = time.perf_counter() - t0
            assert served == K, out_s.getvalue()
            return dt

        run_daemon(2)  # warm pass
        serial = run_daemon(0)
        piped = run_daemon(2)
        print(f"[daemon] {K} x {args.seconds:.0f}s clips: "
              f"serial {serial:.2f} s ({serial/K:.3f} s/clip), "
              f"pipelined {piped:.2f} s ({piped/K:.3f} s/clip) -> "
              f"{serial/piped:.2f}x", flush=True)


if __name__ == "__main__":
    main()
