"""Malformed-input robustness for WAV reading (data/audio_io.py).

Serving takes user-supplied audio (reference model/inference.py:91 delegates
robustness to librosa/audioread); our contract mirrors the MIDI parser's:
any byte string either reads as audio or raises ValueError — never a raw
struct/EOF/ZeroDivision error.
"""
import struct

import numpy as np
import pytest

from ml_music_style_transfer_tpu.data import audio_io


def _valid_file(tmp_path, n=4096, rate=22050) -> str:
    p = str(tmp_path / "ok.wav")
    t = np.arange(n) / rate
    audio_io.write_wav(p, 0.5 * np.sin(2 * np.pi * 440 * t), rate)
    return p


def _assert_clean(tmp_path, raw: bytes):
    p = str(tmp_path / "f.wav")
    with open(p, "wb") as f:
        f.write(raw)
    try:
        y, sr = audio_io.read_wav(p)
    except ValueError:
        return None
    assert np.all(np.isfinite(y)) and sr > 0
    return y


def test_valid_roundtrip(tmp_path):
    p = _valid_file(tmp_path)
    y, sr = audio_io.read_wav(p, sr=44100)
    assert sr == 44100 and y.size > 0 and np.abs(y).max() < 1.01


def test_every_prefix_is_clean(tmp_path):
    with open(_valid_file(tmp_path, n=256), "rb") as f:
        raw = f.read()
    for cut in range(0, len(raw), 7):
        _assert_clean(tmp_path, raw[:cut])


def test_random_garbage(tmp_path):
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(0, 300))
        _assert_clean(tmp_path, rng.integers(0, 256, n).astype(np.uint8).tobytes())


def test_mutated_header(tmp_path):
    with open(_valid_file(tmp_path, n=256), "rb") as f:
        raw = bytearray(f.read())
    rng = np.random.default_rng(1)
    for _ in range(200):
        i = int(rng.integers(0, min(64, len(raw))))
        old = raw[i]
        raw[i] = int(rng.integers(0, 256))
        _assert_clean(tmp_path, bytes(raw))
        raw[i] = old


def test_zero_sample_rate(tmp_path):
    with open(_valid_file(tmp_path), "rb") as f:
        raw = bytearray(f.read())
    i = raw.index(b"fmt ") + 8 + 4  # fmt chunk: tag(2)+channels(2)+rate(4)
    raw[i : i + 4] = struct.pack("<I", 0)
    p = str(tmp_path / "zr.wav")
    with open(p, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(ValueError):
        audio_io.read_wav(p)


def test_empty_data_chunk(tmp_path):
    p = str(tmp_path / "empty.wav")
    audio_io.write_wav(p, np.zeros((0,), np.float32), 44100)
    with pytest.raises(ValueError, match="no samples"):
        audio_io.read_wav(p)


def test_absurd_sample_rate_rejected_before_resampler(tmp_path):
    """A corrupt rate field must raise ValueError, not ask resample_poly to
    design a multi-GB FIR (10*max(up,down) taps)."""
    with open(_valid_file(tmp_path), "rb") as f:
        raw = bytearray(f.read())
    i = raw.index(b"fmt ") + 8 + 4
    for rate in (0xFFFFFFF0, 9_999_991):  # huge; huge prime (gcd 1)
        raw[i : i + 4] = struct.pack("<I", rate)
        p = str(tmp_path / "ar.wav")
        with open(p, "wb") as f:
            f.write(bytes(raw))
        with pytest.raises(ValueError):
            audio_io.read_wav(p)


def test_nonfinite_float_wav_rejected(tmp_path):
    """Float-format WAVs can smuggle NaN/Inf past the RIFF parser; they must
    not reach the STFT as silent garbage."""
    from scipy.io import wavfile

    p = str(tmp_path / "nan.wav")
    y = np.zeros(2048, np.float32)
    y[100] = np.nan
    wavfile.write(p, 44100, y)
    with pytest.raises(ValueError, match="non-finite"):
        audio_io.read_wav(p)


def test_missing_file_stays_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        audio_io.read_wav(str(tmp_path / "nope.wav"))
