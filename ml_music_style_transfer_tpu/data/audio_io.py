"""WAV read/write + resampling (host side).

Replaces librosa.load / soundfile.write (reference preprocess.py:106,
io_manager.py:27-29, inference.py:91) — neither library is a dependency.
Reading returns mono float32 in [-1, 1] resampled to the target rate,
matching librosa.load(sr=...) semantics (resampler: polyphase).

Decode runs NATIVE by default (native/fastloader/wavdec.cpp via ctypes,
which releases the GIL for the whole call): the serving daemon's reader
thread decodes under the completer's device wait even on one core — the
bound that capped pipelined throughput at 1.13x in round 4 — and preprocess
_decode_ahead gets a real second lane. The NumPy/scipy path below remains
the parity anchor and the fallback when the toolchain is absent; both obey
the same malformed-input contract (ValueError, never a raw parser error —
tests/test_wav_fuzz.py runs the full fuzz suite against BOTH).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

_native_lib = None  # None = untried, False = unavailable


def _native():
    """The wavdec C API from libfastloader.so, or None."""
    global _native_lib
    if _native_lib is None:
        try:
            from . import fastloader as _fl

            lib = _fl._load_lib()
            if lib is None:
                _native_lib = False
            else:
                fp = ctypes.POINTER(ctypes.c_float)
                lib.wd_decode.restype = ctypes.c_longlong
                lib.wd_decode.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(fp),
                    ctypes.POINTER(ctypes.c_int)]
                lib.wd_resample_poly.restype = ctypes.c_longlong
                lib.wd_resample_poly.argtypes = [
                    fp, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(fp)]
                lib.wd_free.argtypes = [fp]
                _native_lib = lib
        except (OSError, AttributeError, ImportError):
            # missing toolchain or a stale .so without the wavdec symbols
            _native_lib = False
    return _native_lib or None


def _take_native(lib, ptr, n: int) -> np.ndarray:
    try:
        return np.ctypeslib.as_array(ptr, shape=(int(n),)).copy()
    finally:
        lib.wd_free(ptr)


def _read_wav_native(lib, path: str, sr: int | None) -> tuple[np.ndarray, int]:
    out = ctypes.POINTER(ctypes.c_float)()
    rate_c = ctypes.c_int(0)
    n = lib.wd_decode(path.encode(), ctypes.byref(out), ctypes.byref(rate_c))
    if n == -1:
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        if os.path.isdir(path):
            raise IsADirectoryError(path)
        raise ValueError(f"not a readable WAV file: {path}")
    if n == -4:
        raise ValueError(f"WAV contains no samples: {path}")
    if n == -5:
        raise ValueError(f"WAV contains non-finite samples: {path}")
    if n == -6:
        raise ValueError(f"WAV declares non-positive sample rate: {path}")
    if n < 0:
        raise ValueError(f"not a readable WAV file: {path} (code {n})")
    y = _take_native(lib, out, n)
    rate = int(rate_c.value)
    if sr is not None and rate != sr:
        g = np.gcd(int(sr), int(rate))
        up, down = int(sr) // g, int(rate) // g
        if max(up, down) > 65536:
            raise ValueError(
                f"cannot resample {rate} Hz -> {sr} Hz (ratio {up}/{down} "
                f"too extreme — corrupt sample rate?): {path}")
        out2 = ctypes.POINTER(ctypes.c_float)()
        m = lib.wd_resample_poly(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
            up, down, ctypes.byref(out2))
        if m < 0:
            raise ValueError(f"cannot resample {rate} Hz -> {sr} Hz: {path}")
        y = _take_native(lib, out2, m)
        rate = sr
    return np.ascontiguousarray(y, dtype=np.float32), rate


def read_wav(path: str, sr: int | None = 44100,
             native: bool | None = None) -> tuple[np.ndarray, int]:
    """Load a WAV as mono float32 in [-1, 1], resampled to ``sr`` if given.

    Serving feeds user-supplied files here (reference inference.py:91 via
    librosa), so malformed/truncated/degenerate input raises ValueError —
    never a raw struct/EOF/ZeroDivision error from the RIFF parser or the
    resampler (tests/test_wav_fuzz.py pins the contract). FileNotFoundError
    stays FileNotFoundError.

    ``native``: None (default) uses the GIL-releasing C decoder when built,
    True requires it (raises RuntimeError otherwise), False forces the
    NumPy/scipy path (the parity anchor).
    """
    if native is not False:
        lib = _native()
        if lib is not None:
            return _read_wav_native(lib, path, sr)
        if native is True:
            raise RuntimeError("native WAV decoder unavailable "
                               "(make -C native/fastloader)")
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
