"""Visual spectrogram diagnostic (reference tests/plot_spec.py equivalent).

Renders log-power vs raw-magnitude vs mel spectrograms of one audio chunk
side by side for eyeball comparison of representations. Run manually:

    python -m ml_music_style_transfer_tpu.testing.plot_spec AUDIO.wav [OUT.png]
"""
from __future__ import annotations

import sys

import numpy as np

from ..config import DEFAULT_DSP
from ..data import audio_io
from ..ops import reference as npref


def plot_spec(audio_path: str, out_path: str = "plot_spec.png") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hp = DEFAULT_DSP
    y, _ = audio_io.read_wav(audio_path, sr=hp.sr)
    chunk = y[: hp.samples_per_chunk]
    S = npref.stft(chunk, hp.n_fft, hp.ws)
    mag = np.abs(S)
    logp = np.log1p(mag**2)
    mel = npref.mel_filterbank(hp.sr, hp.n_fft, 128) @ (mag**2)

    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    for ax, (data, title) in zip(
        axes,
        [
            (logp, "log-power log1p(|S|^2) (training representation)"),
            (mag, "raw magnitude |S|"),
            (np.log1p(mel), "mel (128 bands, log1p)"),
        ],
    ):
        ax.imshow(data, origin="lower", aspect="auto", cmap="magma")
        ax.set_title(title)
        ax.set_ylabel("bin")
    axes[-1].set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    return out_path


if __name__ == "__main__":
    audio = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "plot_spec.png"
    print(plot_spec(audio, out))
