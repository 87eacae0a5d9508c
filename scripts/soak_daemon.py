"""Serving-daemon soak: ~100 mixed requests through scripts/serve.py's loop
in ONE warm session on the real TPU (round-4 verdict next #8 — "it's a
product, not a demo").

Request mix: single clips over a few length buckets (the cache-friendly hot
path), dynamic batches, whole-clip one-pass requests, and deliberately
malformed requests (missing files, empty MIDI, corrupt WAV, bad JSON,
unwritable out path) interleaved so error isolation is exercised mid-stream.

Asserts:
  - served count == expected OK count; every malformed request answered
    {"ok": false} and the NEXT request still succeeded (isolation),
  - the serving LRU caches never warn (no eviction thrash at this mix),
  - all output WAVs exist, are finite, non-silent.

Records p50/p90/p99 wall latency per request class into DAEMON_SOAK.json.

Usage (real TPU): python scripts/soak_daemon.py [--requests 100]
       [--width-mult 1.0] [--n-iter 300] [--cpu --width-mult 0.0625]
"""
from __future__ import annotations

import argparse
import io
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=100)
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--n-iter", type=int, default=300)
    ap.add_argument("--pipeline-depth", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (script-logic smoke only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mmst_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import importlib.util

    from ml_music_style_transfer_tpu.config import ModelConfig
    from ml_music_style_transfer_tpu.data.audio_io import read_wav, write_wav
    from ml_music_style_transfer_tpu.infer.synthesize import AudioSynthesizer
    from ml_music_style_transfer_tpu.midi import writer as midi_writer
    from ml_music_style_transfer_tpu.models import PerformanceNet
    from ml_music_style_transfer_tpu.testing import synthetic

    spec_mod = importlib.util.spec_from_file_location(
        "serve", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "serve.py"))
    serve = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(serve)

    root = "/tmp/soak_daemon"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    # fixture clips: 3 length buckets (cache-friendly; lengths in one tile
    # bucket reuse one compiled program) + a short one for whole-clip
    fixtures = {}
    # "novel" (MIDI 9.3 s, audio 10.8 s) is the NOVEL-length probe: it
    # shares every shape bucket with a10 (tile count 4, l_out 1720,
    # cond-STFT frame bucket 2150) but its exact MIDI/audio lengths never
    # appear in the warm pass — before round 5's cond-STFT sample
    # bucketing, its first request paid a fresh remote STFT compile
    # (~20 s p99 in DAEMON_SOAK.json); with bucketing it must run at warm
    # speed.
    for name, dur, adur, style in (
            ("a10", 10.0, 10.0, "cuba"), ("b20", 20.0, 20.0, "upright"),
            ("c30", 30.0, 30.0, "harpsichord"),
            ("w10", 10.0, 10.0, "gentleman"),
            ("novel", 9.3, 10.8, "aliciakeys")):
        notes = synthetic.random_song(rng, duration=dur)
        mp, wp = os.path.join(root, f"{name}.mid"), os.path.join(root, f"{name}.wav")
        midi_writer.save(mp, notes)
        write_wav(wp, synthetic.render_notes(notes, style, duration=adur), 44100)
        fixtures[name] = (mp, wp, dur)
    # fail fast if the novel probe's audio drifted out of a10's STFT bucket
    for a_dur, n_dur in ((10.0, 10.8),):
        b = lambda s: -(-(1 + int(s * 44100) // 256) // 430)  # noqa: E731
        assert b(a_dur) == b(n_dur), (b(a_dur), b(n_dur))

    # malformed fixtures
    bad_wav = os.path.join(root, "bad.wav")
    with open(bad_wav, "wb") as f:
        f.write(b"RIFFgarbage-not-a-wave-file")
    empty_mid = os.path.join(root, "empty.mid")
    midi_writer.save(empty_mid, [])

    cfg = ModelConfig(width_mult=args.width_mult)
    model = PerformanceNet(cfg)
    t = 860
    dummy = (jnp.zeros((1, t, 128)), jnp.zeros((1, t, 1025)),
             jnp.zeros((1, t, 128)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)

    def make_synth(m, a):
        return AudioSynthesizer(root, m, a, model_cfg=cfg, params=params)

    # ---- build the request stream -----------------------------------------
    # class plan per 25 requests: 17 single, 2 batch, 2 whole-clip, 4 bad
    reqs, classes = [], []

    def add(req: dict, klass: str):
        reqs.append(json.dumps(req))
        classes.append(klass)

    singles = ["a10", "b20", "c30"]
    n_built = 0
    i_out = 0
    while n_built < args.requests:
        cyc = n_built % 25
        i_out += 1
        out = os.path.join(root, "out", f"o{i_out}.wav")
        if cyc in (5, 12, 18, 23):  # malformed, interleaved mid-stream
            kind = (n_built // 25 + cyc) % 4
            if kind == 0:
                add({"midi": fixtures["a10"][0], "audio": "/nope/missing.wav",
                     "out": out}, "bad")
            elif kind == 1:
                add({"midi": empty_mid, "audio": fixtures["a10"][1],
                     "out": out}, "bad")
            elif kind == 2:
                add({"midi": fixtures["a10"][0], "audio": bad_wav,
                     "out": out}, "bad")
            else:
                reqs.append('{"this is not valid json')
                classes.append("bad")
        elif cyc in (9, 20):  # dynamic batch of 2 same-length clips
            add({"batch": [
                {"midi": fixtures["a10"][0], "audio": fixtures["a10"][1],
                 "out": out},
                {"midi": fixtures["a10"][0], "audio": fixtures["w10"][1],
                 "out": out.replace(".wav", "b.wav")}],
                "n_iter": args.n_iter}, "batch")
        elif cyc in (3, 15):  # whole-clip one-pass (reference semantics)
            add({"midi": fixtures["w10"][0], "audio": fixtures["w10"][1],
                 "out": out, "n_iter": args.n_iter, "whole_clip": True},
                "whole")
        elif cyc in (7, 21):  # novel length, same buckets as a10 — must
            # NOT compile (cond-STFT sample bucketing, round 5)
            add({"midi": fixtures["novel"][0], "audio": fixtures["novel"][1],
                 "out": out, "n_iter": args.n_iter}, "novel")
        else:
            name = singles[n_built % len(singles)]
            add({"midi": fixtures[name][0], "audio": fixtures[name][1],
                 "out": out, "n_iter": args.n_iter}, f"single_{name[0]}")
        n_built += 1

    # ---- LRU-warning watchdog ----------------------------------------------
    warn_records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            warn_records.append(record.getMessage())

    logging.getLogger("mmst.serving").addHandler(_Catch())

    # ---- warm pass (one request per distinct compiled shape) ---------------
    warm = [json.dumps({"midi": fixtures[n][0], "audio": fixtures[n][1],
                        "out": os.path.join(root, "out", f"warm_{n}.wav"),
                        "n_iter": args.n_iter}) for n in singles]
    warm.append(json.dumps({"midi": fixtures["w10"][0],
                            "audio": fixtures["w10"][1],
                            "out": os.path.join(root, "out", "warm_w.wav"),
                            "n_iter": args.n_iter, "whole_clip": True}))
    # warm the dynamic-batch path too: its grouped-GL program compiling
    # mid-stream was the round-5 soak's batch p99 (27 s) AND, via FIFO
    # head-of-line blocking, the single_b/c/bad p99 tails behind it
    warm.append(json.dumps({"batch": [
        {"midi": fixtures["a10"][0], "audio": fixtures["a10"][1],
         "out": os.path.join(root, "out", "warm_bat.wav")},
        {"midi": fixtures["a10"][0], "audio": fixtures["w10"][1],
         "out": os.path.join(root, "out", "warm_batb.wav")}],
        "n_iter": args.n_iter}))
    expected_warm_ok = len(warm) + 1  # the batch request carries 2 clips
    t0 = time.perf_counter()
    served = serve.serve_loop(make_synth, io.StringIO("\n".join(warm) + "\n"),
                              io.StringIO(),
                              pipeline_depth=args.pipeline_depth)
    log(f"warm pass: {served}/{expected_warm_ok} ok in "
        f"{time.perf_counter()-t0:.1f}s (incl. compiles)")
    assert served == expected_warm_ok

    # ---- the soak -----------------------------------------------------------
    out_s = io.StringIO()
    t0 = time.perf_counter()
    served = serve.serve_loop(make_synth, io.StringIO("\n".join(reqs) + "\n"),
                              out_s, pipeline_depth=args.pipeline_depth)
    wall = time.perf_counter() - t0
    lines = [json.loads(x) for x in out_s.getvalue().splitlines()]
    assert len(lines) == len(reqs), (len(lines), len(reqs))

    lat = {}
    n_bad_ok = n_ok = 0
    isolation_violations = []
    for i, (resp, klass) in enumerate(zip(lines, classes)):
        lat.setdefault(klass, []).append(resp.get("seconds", float("nan")))
        if klass == "bad":
            if resp.get("ok"):
                n_bad_ok += 1
            # the request AFTER a malformed one must not be poisoned
            if i + 1 < len(lines) and classes[i + 1] != "bad" \
                    and not lines[i + 1].get("ok"):
                isolation_violations.append(i + 1)
        elif resp.get("ok"):
            n_ok += 1
    expected_ok = sum(1 for k in classes if k != "bad")
    log(f"soak: {len(reqs)} requests in {wall:.1f}s; ok={n_ok}/{expected_ok} "
        f"bad-marked-ok={n_bad_ok} isolation_violations={isolation_violations} "
        f"lru_warnings={len(warn_records)}")
    assert n_bad_ok == 0
    assert not isolation_violations
    assert n_ok == expected_ok, (n_ok, expected_ok)
    assert not warn_records, warn_records[:3]

    # output sanity on a sample
    y, sr = read_wav(os.path.join(root, "out", "o1.wav"))
    assert np.all(np.isfinite(y)) and np.abs(y).max() > 0

    def pct(xs, q):
        return round(float(np.percentile([x for x in xs if np.isfinite(x)], q)), 3)

    result = {
        "requests": len(reqs),
        "wall_s": round(wall, 1),
        "width_mult": args.width_mult,
        "n_iter": args.n_iter,
        "pipeline_depth": args.pipeline_depth,
        "ok": n_ok,
        "expected_ok": expected_ok,
        "bad_requests": sum(1 for k in classes if k == "bad"),
        "isolation_violations": 0,
        "lru_warnings": 0,
        "latency_s": {
            k: {"n": len(v), "p50": pct(v, 50), "p90": pct(v, 90),
                "p99": pct(v, 99)}
            for k, v in sorted(lat.items())},
        "platform": jax.devices()[0].platform,
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DAEMON_SOAK.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
