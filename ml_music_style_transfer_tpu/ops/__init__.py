"""TPU compute ops: STFT/iSTFT, log-power compression, Griffin-Lim, mel.

Submodules (imported as modules to avoid name shadowing):
  - ops.stft: stft/istft/log_power/inverse_log_power/log_power_stft
  - ops.griffinlim: griffinlim/griffinlim_from_log_power
  - ops.mel: mel_filterbank/melspectrogram_from_power
  - ops.reference: NumPy golden implementations (parity anchor)
"""
from . import stft, griffinlim, mel, reference  # noqa: F401
