"""Import trained reference (PyTorch) checkpoints into this framework.

The reference saves ``torch.save({'epoch','state_dict','optimizer'}, ...)``
checkpoints (model/train.py:204). This module converts such a state_dict
into the flax param tree of models.PerformanceNet so users migrating from
the reference keep their trained models. Run imported models with
``ModelConfig(compat_mbr_noop=True)`` for output parity (the reference's
MBR blocks contribute 2x doubling and their params receive no gradients —
see models/layers.py:MBRBlock).

Weight layout translations (torch -> flax, channel-last):
  - Conv1d weight (out, in, k)          -> kernel (k, in, out)
  - ConvTranspose1d weight (in, out, k) -> kernel (k, in, out)
  - Linear weight (out, in)             -> Dense kernel (in, out)

Key map (reference model.py -> models/performance_net.py):
  down_convs.{i}.conv{1,2}         -> midi_down_{i}/Conv1x3_{0,1}/Conv_0
  down_convs_audio.{i}.conv{1,2}   -> audio_down_{i}/Conv1x3_{0,1}/Conv_0
  dense_concats.{i}.fc{1,2}        -> dense_concat_{i}/Dense_{0,1}
  up_convs.{i}.upconv              -> up_{i}/ConvTranspose1dTorch_0
  up_convs.{i}.conv{1,2}           -> up_{i}/Conv1x3_{0,1}/Conv_0
  onset_offset_encoder.down_convs.{i}.conv{1,2}
                                   -> onset_offset_encoder/down_{i}/Conv1x3_{0,1}/Conv_0
  MBRBlock{j}.conv_list{1,2}.{i}   -> mbr_{j-1}/conv{1,2}_{i}/Conv_0
  lastconv                         -> lastconv
(InstanceNorm1d layers carry no parameters on either side.)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)


def _convT_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 0, 1)  # (in,out,k) -> (k,in,out)


def _lin_w(t) -> np.ndarray:
    return np.asarray(t).T  # (out,in) -> (in,out)


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.ascontiguousarray(value, dtype=np.float32)


_RULES = [
    # (regex on torch key, flax path template, weight transform)
    (re.compile(r"^down_convs\.(\d+)\.conv([12])\.(weight|bias)$"),
     lambda m: f"midi_down_{m.group(1)}/Conv1x3_{int(m.group(2)) - 1}/Conv_0", _conv_w),
    (re.compile(r"^down_convs_audio\.(\d+)\.conv([12])\.(weight|bias)$"),
     lambda m: f"audio_down_{m.group(1)}/Conv1x3_{int(m.group(2)) - 1}/Conv_0", _conv_w),
    (re.compile(r"^onset_offset_encoder\.down_convs\.(\d+)\.conv([12])\.(weight|bias)$"),
     lambda m: f"onset_offset_encoder/down_{m.group(1)}/Conv1x3_{int(m.group(2)) - 1}/Conv_0",
     _conv_w),
    (re.compile(r"^dense_concats\.(\d+)\.fc([12])\.(weight|bias)$"),
     lambda m: f"dense_concat_{m.group(1)}/Dense_{int(m.group(2)) - 1}", _lin_w),
    (re.compile(r"^up_convs\.(\d+)\.upconv\.(weight|bias)$"),
     lambda m: f"up_{m.group(1)}/ConvTranspose1dTorch_0", _convT_w),
    (re.compile(r"^up_convs\.(\d+)\.conv([12])\.(weight|bias)$"),
     lambda m: f"up_{m.group(1)}/Conv1x3_{int(m.group(2)) - 1}/Conv_0", _conv_w),
    (re.compile(r"^MBRBlock(\d)\.conv_list([12])\.(\d+)\.(weight|bias)$"),
     lambda m: f"mbr_{int(m.group(1)) - 1}/conv{m.group(2)}_{m.group(3)}/Conv_0", _conv_w),
    (re.compile(r"^lastconv\.(weight|bias)$"), lambda m: "lastconv", _convT_w),
]


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference PerformanceNet state_dict -> flax {'params': ...} tree.

    Unrecognized keys raise (so silent drops can't corrupt a migration);
    InstanceNorm buffers don't exist in the reference config (affine=False,
    track_running_stats=False) and so never appear.
    """
    params: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        for rx, path_fn, w_transform in _RULES:
            m = rx.match(key)
            if m:
                base = path_fn(m)
                if key.endswith("weight"):
                    _set(params, f"{base}/kernel", w_transform(tensor))
                else:
                    _set(params, f"{base}/bias", np.asarray(tensor))
                break
        else:
            raise KeyError(f"unmapped reference checkpoint key: {key}")
    return {"params": params}


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference checkpoint-{epoch}.tar and convert its state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return convert_state_dict({k: v.numpy() for k, v in state.items()})
