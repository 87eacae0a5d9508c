"""End-to-end synthesis (serving) benchmark on the real TPU.

Measures the full inference path of AudioSynthesizer — MIDI/audio processing
(host), chunk-tiled batched forward (TPU), Griffin-Lim 300 (TPU) — for a
30 s clip at flagship width, steady-state (compile excluded via a warm-up
clip of the same bucketed shapes). Reference equivalent: model/inference.py
main() (eager CPU torch + librosa GL).

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
        chunks = synth.process_custom_midi_and_audio(midi_path, wav_path)
        t1 = time.perf_counter()
        spec = synth.predict_spectrogram(*chunks)
        t2 = time.perf_counter()
        wav = synth.griffinlim(
            np.pad(spec, ((0, -(-spec.shape[0] // 430) * 430 - spec.shape[0]),
                          (0, 0))).T, n_iter=args.n_iter)
        _ = float(np.abs(wav).max())
        t3 = time.perf_counter()
        return t1 - t0, t2 - t1, t3 - t2, wav

    for i in range(3):  # warm-up (compile) + 2 steady-state
        th, tf, tg, wav = run()
        total = th + tf + tg
        tag = "compile+run" if i == 0 else "steady"
        print(f"[{tag}] host-process {th*1e3:7.1f} ms | forward {tf*1e3:7.1f} ms "
              f"| GL{args.n_iter} {tg*1e3:7.1f} ms | total {total:6.2f} s "
              f"({args.seconds/total:4.1f}x realtime)", flush=True)
    assert np.all(np.isfinite(wav)) and np.abs(wav).max() > 0


if __name__ == "__main__":
    main()
