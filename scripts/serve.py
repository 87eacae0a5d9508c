"""Long-lived serving daemon: JSON-lines requests -> synthesized WAVs.

The one-shot CLI (infer/cli.py) pays process startup + checkpoint load per
clip; this daemon holds the warm state — module-level jit caches, the
device-resident param tree, and the persistent XLA compile cache — so every
request after the first runs at steady-state serving speed (measured
1.26 s per 30 s clip at flagship width on the v5e, ~23.8x realtime;
scripts/bench_inference.py).

Requests are PIPELINED: the reader thread parses + uploads + dispatches
(async JAX dispatch), a completer thread blocks on device results, writes
WAVs, and emits responses in request order — so host prep of request N+1
hides under device Griffin-Lim of request N (--pipeline-depth, default 2).

Protocol: one JSON object per stdin line ->
    {"midi": PATH, "audio": PATH, "out": PATH,
     "n_iter": 300, "cond_mode": "aligned"|"center",
     "overlap": true, "whole_clip": false,
     # whole-clip extras: shard_gl (default auto) time-shards Griffin-Lim
     # over the mesh alongside the forward (parallel/gl_shard.py)
     "shard_gl": null|true|false, "gl_halo": 32, "gl_rounds": 10}
one JSON response per stdout line:
    {"ok": true, "out": PATH, "seconds": S, "realtime_x": R}
    {"ok": false, "error": "..."}
EOF (or a line "quit") shuts down cleanly.

Dynamic batching: a request may instead carry a list of clips ->
    {"batch": [{"midi": PATH, "audio": PATH, "out": PATH}, ...],
     "n_iter": 300, "cond_mode": "aligned", "overlap": true}
All clips' forwards run device-resident, then equal-length clips share ONE
Griffin-Lim dispatch (batched over the data mesh when --mesh-data > 1;
infer/bulk.py). The response is one line with per-item results:
    {"ok": true, "batch": [{"ok": true, "out": PATH} | {"ok": false,
     "error": "..."}, ...], "seconds": S}

Usage:
    python scripts/serve.py -exp-name NAME [--width-mult F] [--use-ema] \
        [--checkpoint PATH] < requests.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_wav_out(wav, out_path, sr) -> None:
    from ml_music_style_transfer_tpu.data import audio_io

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    audio_io.write_wav(out_path, wav, sr)


def warmup(make_synth, durations, n_iter: int = 300, batch: bool = True,
           whole_clip: bool = False, mesh=None) -> None:
    """Pre-compile the serving programs before the first real request.

    For each duration (seconds) a synthetic MIDI+WAV pair is generated and
    run through the SAME paths requests take — the tiled single-clip
    synthesis (optionally the dynamic-batch and whole-clip paths too) — so
    the first-touch compiles land at daemon startup instead of inside a
    user's request (the round-5 soak measured ~23 s p99 tails from exactly
    those mid-stream compiles). Because every serving program is keyed on
    BUCKETED shapes (tile count to 4, output frames to 430, and the
    conditioning STFT to a ~2.5 s sample bucket), warming one duration covers
    every clip whose MIDI and audio lengths fall in the same buckets.
    """
    import tempfile

    import numpy as np

    from ml_music_style_transfer_tpu.data.audio_io import write_wav
    from ml_music_style_transfer_tpu.infer import bulk
    from ml_music_style_transfer_tpu.midi import writer as midi_writer
    from ml_music_style_transfer_tpu.testing import synthetic

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="mmst_warmup_") as tmp:
        for k, dur in enumerate(durations):
            t0 = time.perf_counter()
            notes = synthetic.random_song(rng, duration=float(dur))
            mp = os.path.join(tmp, f"warm{k}.mid")
            wp = os.path.join(tmp, f"warm{k}.wav")
            midi_writer.save(mp, notes)
            write_wav(wp, rng.standard_normal(
                int(float(dur) * 44100)).astype(np.float32) * 0.1, 44100)
            synth = make_synth(mp, wp)
            synth.synthesize_waveform(n_iter=n_iter)
            if batch:  # grouped one-dispatch Griffin-Lim program
                bulk.batch_synthesize_waveforms(
                    [synth, make_synth(mp, wp)], n_iter=n_iter, mesh=mesh)
            if whole_clip:
                synth.synthesize_whole_clip(n_iter=n_iter)
            print(f"warmup {dur}s: {time.perf_counter() - t0:.1f}s "
                  f"(batch={batch} whole_clip={whole_clip})", file=sys.stderr)


def _serve_batch(make_synth, req, mesh) -> dict:
    """One dynamic batch: device-resident forwards, grouped one-dispatch GL
    (per-item error isolation inside bulk.batch_synthesize_waveforms)."""
    from ml_music_style_transfer_tpu.infer import bulk

    items = req["batch"]
    synths, results = [], [None] * len(items)
    idx_map = []  # position in `synths` -> position in `items`
    for i, it in enumerate(items):
        try:
            synths.append(make_synth(it["midi"], it["audio"]))
            idx_map.append(i)
        except Exception as e:  # per-item isolation at construction too
            results[i] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    wavs, errors = bulk.batch_synthesize_waveforms(
        synths, n_iter=int(req.get("n_iter", 300)),
        overlap=bool(req.get("overlap", True)),
        cond_mode=req.get("cond_mode", "aligned"), mesh=mesh)
    for j, i in enumerate(idx_map):
        if errors[j] is not None:
            results[i] = {"ok": False, "error": errors[j]}
            continue
        try:  # writes are per-item isolated too: one unwritable "out" path
            # must not discard the other items' finished results
            _write_wav_out(wavs[j], items[i]["out"], synths[j].hp.sr)
            results[i] = {"ok": True, "out": items[i]["out"]}
        except Exception as e:  # noqa: BLE001 — per-request isolation
            results[i] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    return {"ok": True, "batch": results}


def serve_loop(make_synth, in_stream, out_stream, mesh=None,
               pipeline_depth: int = 2) -> int:
    """Handle requests until EOF/'quit'. Returns the number served.

    ``make_synth(midi, audio)`` returns an AudioSynthesizer for the request's
    sources; the module-level caches make repeat construction cheap (no
    recompile, no params re-upload). ``mesh``: optional data mesh for batch
    requests' Griffin-Lim scale-out.

    PIPELINED (round-3 verdict #7): the reader thread does the host work —
    JSON parse, MIDI parse, WAV decode, upload, async device dispatch
    (AudioSynthesizer.synthesize_waveform_async) — while a single completer
    thread blocks on the device result, writes the WAV, and emits the
    response. Host prep of request N+1 hides under device Griffin-Lim of
    request N (~0.26 s host + ~0.38 s device per 30 s clip at flagship
    width, so overlap is worth ~1.4x throughput at equal latency).
    ``pipeline_depth`` bounds in-flight dispatched requests (device arrays
    held in HBM); responses stay in request order (single FIFO completer).
    Batch and whole-clip requests run as completer-side units — still in
    order, still isolated per request. ``pipeline_depth=0`` disables
    overlap (the reader blocks until the completer drains each request).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, pipeline_depth))
    served = 0
    lock = threading.Lock()  # guards `served` (completer) vs return (reader)

    def emit(resp: dict, t0: float, n_ok: int) -> None:
        nonlocal served
        resp["seconds"] = round(time.perf_counter() - t0, 3)
        with lock:
            served += n_ok
        out_stream.write(json.dumps(resp) + "\n")
        out_stream.flush()

    def completer() -> None:
        while True:
            item = q.get()
            try:
                if item is None:
                    return
                kind, payload, t0 = item
                if kind == "resp":  # parse/dispatch-time error, pre-built
                    emit(payload, t0, 0)
                    continue
                if kind == "thunk":  # batch / whole-clip / sync fallback
                    try:
                        resp = payload()
                        n_ok = (sum(r["ok"] for r in resp["batch"])
                                if "batch" in resp else int(resp["ok"]))
                    except Exception as e:  # noqa: BLE001 — isolation
                        resp = {"ok": False,
                                "error": f"{type(e).__name__}: {e}"}
                        n_ok = 0
                    emit(resp, t0, n_ok)
                    continue
                # kind == "fetch": block on the in-flight device result
                fetch, out_path, sr = payload
                try:
                    wav = fetch()
                    _write_wav_out(wav, out_path, sr)
                    dt = time.perf_counter() - t0
                    resp = {"ok": True, "out": out_path,
                            "realtime_x": round(len(wav) / sr / dt, 2)}
                    n_ok = 1
                except Exception as e:  # noqa: BLE001 — isolation
                    resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                    n_ok = 0
                emit(resp, t0, n_ok)
            finally:
                q.task_done()

    worker = threading.Thread(target=completer, name="serve-completer",
                              daemon=True)
    worker.start()
    try:
        for line in in_stream:
            line = line.strip()
            if not line:
                continue
            if line == "quit":
                break
            t0 = time.perf_counter()
            try:
                req = json.loads(line)
                if "batch" in req:
                    q.put(("thunk",
                           lambda req=req: _serve_batch(make_synth, req, mesh),
                           t0))
                    continue
                synth = make_synth(req["midi"], req["audio"])
                n_iter = int(req.get("n_iter", 300))
                if req.get("whole_clip"):
                    # shard_gl (default auto): time-shard Griffin-Lim over
                    # the mesh too, so long-clip serving scales in both
                    # phases. Whole-clip synthesis gathers/fetches
                    # internally, so it runs as one completer-side unit.
                    def run_whole(synth=synth, req=req, n_iter=n_iter):
                        wav = synth.synthesize_whole_clip(
                            n_iter=n_iter, shard_gl=req.get("shard_gl"),
                            gl_halo=int(req.get("gl_halo", 32)),
                            gl_rounds=int(req.get("gl_rounds", 10)))
                        _write_wav_out(wav, req["out"], synth.hp.sr)
                        return {"ok": True, "out": req["out"]}

                    q.put(("thunk", run_whole, t0))
                    continue
                # the hot path: host prep + async dispatch HERE, device
                # wait + WAV write in the completer
                fetch = synth.synthesize_waveform_async(
                    n_iter=n_iter,
                    overlap=bool(req.get("overlap", True)),
                    cond_mode=req.get("cond_mode", "aligned"))
                q.put(("fetch", (fetch, req["out"], synth.hp.sr), t0))
                if pipeline_depth == 0:
                    q.join()
            except Exception as e:  # per-request isolation at dispatch time
                q.put(("resp", {"ok": False,
                                "error": f"{type(e).__name__}: {e}"}, t0))
    finally:
        q.put(None)
        worker.join()
    with lock:
        return served


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-exp-name", dest="exp_name", required=True)
    ap.add_argument("--width-mult", type=float, default=1.0)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--exp-root", default="./experiments")
    ap.add_argument("--mesh-data", type=int, default=1,
                    help="data-parallel devices for batch requests' "
                         "Griffin-Lim scale-out (infer/bulk.py)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="max in-flight dispatched requests: host prep of "
                         "request N+1 overlaps device work of request N "
                         "(0 = serial)")
    ap.add_argument("--warmup", default="",
                    help="comma-separated clip durations (seconds) to "
                         "pre-compile at startup, e.g. '10,30,60' — shape "
                         "buckets mean one duration covers its whole ~2.5 s "
                         "neighborhood; '' disables")
    ap.add_argument("--warmup-whole-clip", action="store_true",
                    help="also pre-compile the whole-clip one-pass program "
                         "per --warmup duration (length-exact, not bucketed)")
    args = ap.parse_args(argv)

    from ml_music_style_transfer_tpu.config import ModelConfig
    from ml_music_style_transfer_tpu.infer.synthesize import AudioSynthesizer
    from ml_music_style_transfer_tpu.utils.profiling import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()
    exp_dir = os.path.join(os.path.abspath(args.exp_root), args.exp_name)
    cfg = ModelConfig(width_mult=args.width_mult)

    mesh = None
    if args.mesh_data > 1:
        import jax
        from ml_music_style_transfer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.mesh_data,
                         devices=jax.devices()[: args.mesh_data])

    def make_synth(midi, audio):
        return AudioSynthesizer(exp_dir, midi, audio, model_cfg=cfg,
                                checkpoint_path=args.checkpoint,
                                use_ema=args.use_ema)

    if args.warmup:
        warmup(make_synth,
               [float(d) for d in args.warmup.split(",") if d.strip()],
               whole_clip=args.warmup_whole_clip, mesh=mesh)
    print(f"serving {exp_dir} (width_mult={args.width_mult}); "
          "one JSON request per line, 'quit' or EOF to stop", file=sys.stderr)
    n = serve_loop(make_synth, sys.stdin, sys.stdout, mesh=mesh,
                   pipeline_depth=args.pipeline_depth)
    print(f"served {n} requests", file=sys.stderr)


if __name__ == "__main__":
    main()
