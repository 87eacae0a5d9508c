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
    ap.add_argument("--skip-whole-clip", action="store_true",
                    help="skip the whole-clip one-pass section (the "
                         "reference's literal inference semantics, "
                         "model/inference.py:82-84: one forward, "
                         "InstanceNorm statistics spanning the clip)")
    ap.add_argument("--probe-cap-seconds", type=float, default=960.0,
                    help="max clip length attempted when probing the "
                         "longest one-pass clip one v5e's HBM admits "
                         "(doubling from 60 s; 0 disables the probe)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the script "
                         "logic only; serving numbers count on the TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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

    if not args.skip_whole_clip:
        # ---- whole-clip one-pass serving (round-4 verdict missing #1) ----
        # The reference feeds the WHOLE clip through one forward with
        # InstanceNorm statistics spanning it (model/inference.py:82-84);
        # the serving default above tiles into 860-frame windows + 50%
        # overlap crossfade (per-tile IN statistics). Measure (a) the
        # faithful path's latency at this width, (b) the output divergence
        # between the two on the same inputs, (c) the longest clip one
        # chip's HBM admits in one pass.
        import json as js

        wc = {"seconds": args.seconds, "width_mult": args.width_mult,
              "n_iter": args.n_iter}

        def run_whole():
            t0 = time.perf_counter()
            w = synth.synthesize_whole_clip(n_iter=args.n_iter)
            _ = float(np.abs(w).max())
            return time.perf_counter() - t0, w

        wc_times = []
        for i in range(3):
            dt, wwav = run_whole()
            tag = "compile+run" if i == 0 else "steady"
            print(f"[whole-clip {tag}] one-pass total {dt:6.2f} s "
                  f"({args.seconds/dt:4.1f}x realtime)", flush=True)
            wc_times.append(dt)
        assert np.all(np.isfinite(wwav)) and np.abs(wwav).max() > 0
        wc["steady_s"] = round(min(wc_times[1:]), 3)
        tiled_steady = total  # last steady-state tiled run from above
        wc["tiled_steady_s"] = round(tiled_steady, 3)
        wc["wholeclip_over_tiled"] = round(min(wc_times[1:]) / tiled_steady, 2)

        # output divergence, same inputs (random-init flagship weights here;
        # the TRAINED-model number comes from quality_gate_tpu.py
        # --wholeclip-divergence and lands in the gate artifact)
        spec_tiled_dev, t_tot = synth._predict_device(midi_path, wav_path)
        spec_tiled = np.asarray(spec_tiled_dev, np.float32)[:t_tot]
        roll_w, onoff_w, cond_w, t_total_w = synth.process_whole_clip(
            midi_path, wav_path)
        spec_whole = np.asarray(synth.predict_spectrogram_whole_clip(
            roll_w, onoff_w, cond_w, t_total_w), np.float32)
        t_cmp = min(spec_tiled.shape[0], spec_whole.shape[0])
        a, b = spec_tiled[:t_cmp], spec_whole[:t_cmp]
        win = 860 if t_cmp > 3 * 860 else t_cmp // 4  # interior must be non-empty
        ai, bi = a[win:t_cmp - win], b[win:t_cmp - win]
        wc["divergence"] = {
            "t_frames_compared": int(t_cmp),
            "interior_margin_frames": int(win),
            "rel_l2": round(float(np.linalg.norm(a - b))
                            / max(float(np.linalg.norm(b)), 1e-9), 4),
            "interior_rel_l2": round(float(np.linalg.norm(ai - bi))
                                     / max(float(np.linalg.norm(bi)), 1e-9), 4),
            "mean_abs": round(float(np.mean(np.abs(a - b))), 4),
            "spec_mean_abs_level": round(float(np.mean(np.abs(b))), 4),
            "params": "random-init",
        }
        print(f"[whole-clip] tiled-vs-whole divergence: "
              f"rel_l2={wc['divergence']['rel_l2']} "
              f"interior={wc['divergence']['interior_rel_l2']} "
              f"mean_abs={wc['divergence']['mean_abs']} "
              f"(spec level {wc['divergence']['spec_mean_abs_level']})",
              flush=True)

        # longest one-pass clip on one chip (doubling probe; short GL — the
        # HBM question is the forward's)
        if args.probe_cap_seconds > 0:
            ok_s, fail_s, fail_err = 0.0, None, None
            dur = 60.0
            while dur <= args.probe_cap_seconds:
                notes_p = synthetic.random_song(np.random.default_rng(1),
                                                duration=dur)
                mp = os.path.join(root, f"probe_{int(dur)}.mid")
                wp = os.path.join(root, f"probe_{int(dur)}.wav")
                midi_writer.save(mp, notes_p)
                write_wav(wp, synthetic.render_notes(
                    notes_p, "harpsichord", duration=min(dur, 30.0)), 44100)
                s2 = AudioSynthesizer(root, mp, wp, model_cfg=cfg,
                                      params=params)
                try:
                    t0 = time.perf_counter()
                    w = s2.synthesize_whole_clip(n_iter=30)
                    assert np.all(np.isfinite(w))
                    dt = time.perf_counter() - t0
                    print(f"[whole-clip probe] {dur:5.0f} s clip OK "
                          f"({dt:.1f} s incl. compile)", flush=True)
                    ok_s = dur
                except Exception as e:  # RESOURCE_EXHAUSTED lands here
                    fail_s, fail_err = dur, f"{type(e).__name__}: {e}"
                    print(f"[whole-clip probe] {dur:5.0f} s clip FAILED: "
                          f"{fail_err[:200]}", flush=True)
                    break
                dur *= 2
            wc["max_onepass_probe"] = {
                "longest_ok_s": ok_s,
                "first_fail_s": fail_s,
                "fail_error": (fail_err or "")[:300],
                "cap_s": args.probe_cap_seconds,
            }

        # non-flagship widths get their own artifact so a frontier run
        # can't clobber the canonical full-width numbers
        suffix = ("" if args.width_mult == 1.0
                  else "_W" + f"{args.width_mult:g}".replace(".", "p"))
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"SERVING_WHOLECLIP{suffix}.json")
        with open(out_path, "w") as f:
            js.dump(wc, f, indent=1)
        print("[whole-clip] " + js.dumps(wc), flush=True)

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
