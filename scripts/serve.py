"""Long-lived serving daemon: JSON-lines requests -> synthesized WAVs.

The one-shot CLI (infer/cli.py) pays process startup + checkpoint load per
clip; this daemon holds the warm state — module-level jit caches, the
device-resident param tree, and the persistent XLA compile cache — so every
request after the first runs at steady-state serving speed (measured
1.26 s per 30 s clip at flagship width on the v5e, ~23.8x realtime;
scripts/bench_inference.py).

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


def serve_loop(make_synth, in_stream, out_stream, mesh=None) -> int:
    """Handle requests until EOF/'quit'. Returns the number served.

    ``make_synth(midi, audio)`` returns an AudioSynthesizer for the request's
    sources; the module-level caches make repeat construction cheap (no
    recompile, no params re-upload). ``mesh``: optional data mesh for batch
    requests' Griffin-Lim scale-out.
    """
    served = 0
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
                resp = _serve_batch(make_synth, req, mesh)
                resp["seconds"] = round(time.perf_counter() - t0, 3)
                served += sum(r["ok"] for r in resp["batch"])
                out_stream.write(json.dumps(resp) + "\n")
                out_stream.flush()
                continue
            synth = make_synth(req["midi"], req["audio"])
            n_iter = int(req.get("n_iter", 300))
            if req.get("whole_clip"):
                # shard_gl (default auto): time-shard Griffin-Lim over the
                # mesh too, so long-clip serving scales in both phases
                wav = synth.synthesize_whole_clip(
                    n_iter=n_iter, shard_gl=req.get("shard_gl"),
                    gl_halo=int(req.get("gl_halo", 32)),
                    gl_rounds=int(req.get("gl_rounds", 10)))
            else:
                wav = synth.synthesize_waveform(
                    n_iter=n_iter,
                    overlap=bool(req.get("overlap", True)),
                    cond_mode=req.get("cond_mode", "aligned"))
            out_path = req["out"]
            _write_wav_out(wav, out_path, synth.hp.sr)
            dt = time.perf_counter() - t0
            resp = {"ok": True, "out": out_path, "seconds": round(dt, 3),
                    "realtime_x": round(len(wav) / synth.hp.sr / dt, 2)}
            served += 1
        except Exception as e:  # per-request isolation: the daemon survives
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        out_stream.write(json.dumps(resp) + "\n")
        out_stream.flush()
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

    print(f"serving {exp_dir} (width_mult={args.width_mult}); "
          "one JSON request per line, 'quit' or EOF to stop", file=sys.stderr)
    n = serve_loop(make_synth, sys.stdin, sys.stdout, mesh=mesh)
    print(f"served {n} requests", file=sys.stderr)


if __name__ == "__main__":
    main()
