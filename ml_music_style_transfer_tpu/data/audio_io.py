"""WAV read/write + resampling (host side).

Replaces librosa.load / soundfile.write (reference preprocess.py:106,
io_manager.py:27-29, inference.py:91) — neither library is a dependency.
Reading returns mono float32 in [-1, 1] resampled to the target rate,
matching librosa.load(sr=...) semantics (resampler: polyphase).
"""
from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_wav(path: str, sr: int | None = 44100) -> tuple[np.ndarray, int]:
    """Load a WAV as mono float32 in [-1, 1], resampled to ``sr`` if given.

    Serving feeds user-supplied files here (reference inference.py:91 via
    librosa), so malformed/truncated/degenerate input raises ValueError —
    never a raw struct/EOF/ZeroDivision error from the RIFF parser or the
    resampler (tests/test_wav_fuzz.py pins the contract). FileNotFoundError
    stays FileNotFoundError.
    """
    import warnings

    try:
        with warnings.catch_warnings():
            # scipy warns per odd/unknown RIFF chunk on files it still
            # reads; we validate the decoded audio instead (librosa is
            # silent here too)
            warnings.simplefilter("ignore")
            rate, data = wavfile.read(path)
    except (FileNotFoundError, IsADirectoryError):
        raise
    except Exception as e:  # scipy leaks ValueError/struct.error/EOFError…
        raise ValueError(f"not a readable WAV file: {path}: {e}") from e
    if int(rate) <= 0:
        raise ValueError(f"WAV declares non-positive sample rate {rate}: {path}")
    if data.size == 0:
        raise ValueError(f"WAV contains no samples: {path}")
    if data.dtype.kind == "f" and not np.isfinite(data).all():
        # float-format WAVs can smuggle NaN/Inf past the RIFF parser; they
        # would propagate through the resampler into an all-NaN spectrogram.
        # Integer PCM cannot encode non-finite values, so the check (and the
        # copy a dtype conversion would force) is skipped for it.
        raise ValueError(f"WAV contains non-finite samples: {path}")
    if data.dtype == np.int16:
        y = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        y = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        y = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32/float64 wavs
        y = data.astype(np.float32)
    if y.ndim == 2:
        y = y.mean(axis=1)
    if sr is not None and rate != sr:
        g = np.gcd(int(sr), int(rate))
        up, down = int(sr) // g, int(rate) // g
        if max(up, down) > 65536:
            # resample_poly designs a ~10*max(up,down)-tap FIR: an absurd
            # declared rate (or a coprime pair) would ask for a multi-GB
            # filter and OOM instead of erroring. Real audio rates (8k-384k
            # vs 44100) reduce far below this bound.
            raise ValueError(
                f"cannot resample {rate} Hz -> {sr} Hz (ratio {up}/{down} "
                f"too extreme — corrupt sample rate?): {path}")
        y = resample_poly(y.astype(np.float64), up, down).astype(np.float32)
        rate = sr
    return np.ascontiguousarray(y, dtype=np.float32), rate


def write_wav(path: str, y: np.ndarray, sr: int = 44100) -> None:
    """Write mono float array as 16-bit PCM WAV (sf.write equivalent)."""
    y = np.asarray(y, dtype=np.float32)
    y = np.clip(y, -1.0, 1.0)
    wavfile.write(path, sr, (y * 32767.0).astype(np.int16))
