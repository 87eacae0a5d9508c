"""Export trained models to the reference's (PyTorch) checkpoint format.

The inverse of compat/torch_import.py: a flax PerformanceNet param tree
becomes a ``torch.save({'epoch','state_dict','optimizer'}, ...)`` file the
reference loads directly (model/inference.py:27-29 reads
``checkpoint['state_dict']``; model/train.py:204 is the writer whose layout
we reproduce). With this, migration works in BOTH directions: reference
users can import their .tar checkpoints here (torch_import), and models
trained here can be synthesized with the unmodified reference code.

Weight layout translations (flax channel-last -> torch):
  - Conv kernel (k, in, out)          -> Conv1d weight (out, in, k)
  - ConvTranspose kernel (k, in, out) -> ConvTranspose1d weight (in, out, k)
  - Dense kernel (in, out)            -> Linear weight (out, in)

Key map is the exact inverse of torch_import._RULES. ``optimizer`` is saved
as None: the reference only reads it on train-resume, and optax Adam state
has no faithful torch.optim.Adam serialization (documented divergence).

Only width_mult=1.0 trees produce reference-loadable files (the reference's
channel plan is fixed); other widths fail its strict load_state_dict with a
shape error, which is the desired loud failure.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _conv_w(k) -> np.ndarray:
    return np.asarray(k).transpose(2, 1, 0)  # (k,in,out) -> (out,in,k)


def _convT_w(k) -> np.ndarray:
    return np.asarray(k).transpose(1, 2, 0)  # (k,in,out) -> (in,out,k)


def _lin_w(k) -> np.ndarray:
    return np.asarray(k).T  # (in,out) -> (out,in)


# (regex on the flattened flax path, torch key template, kernel transform)
_RULES = [
    (re.compile(r"^midi_down_(\d+)/Conv1x3_([01])/Conv_0$"),
     lambda m: f"down_convs.{m.group(1)}.conv{int(m.group(2)) + 1}", _conv_w),
    (re.compile(r"^audio_down_(\d+)/Conv1x3_([01])/Conv_0$"),
     lambda m: f"down_convs_audio.{m.group(1)}.conv{int(m.group(2)) + 1}", _conv_w),
    (re.compile(r"^onset_offset_encoder/down_(\d+)/Conv1x3_([01])/Conv_0$"),
     lambda m: f"onset_offset_encoder.down_convs.{m.group(1)}.conv{int(m.group(2)) + 1}",
     _conv_w),
    (re.compile(r"^dense_concat_(\d+)/Dense_([01])$"),
     lambda m: f"dense_concats.{m.group(1)}.fc{int(m.group(2)) + 1}", _lin_w),
    (re.compile(r"^up_(\d+)/ConvTranspose1dTorch_0$"),
     lambda m: f"up_convs.{m.group(1)}.upconv", _convT_w),
    (re.compile(r"^up_(\d+)/Conv1x3_([01])/Conv_0$"),
     lambda m: f"up_convs.{m.group(1)}.conv{int(m.group(2)) + 1}", _conv_w),
    (re.compile(r"^mbr_(\d+)/conv([12])_(\d+)/Conv_0$"),
     lambda m: f"MBRBlock{int(m.group(1)) + 1}.conv_list{m.group(2)}.{m.group(3)}",
     _conv_w),
    (re.compile(r"^lastconv$"), lambda m: "lastconv", _convT_w),
]


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def to_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Flax PerformanceNet params (with or without the 'params' wrapper) ->
    reference state_dict of float32 numpy arrays (torch-layout).

    Unrecognized module paths raise, so a partially-translated checkpoint
    can never be written silently.
    """
    if "params" in params and isinstance(params["params"], Mapping):
        params = params["params"]
    flat = _flatten(params)
    modules: Dict[str, Dict[str, Any]] = {}
    for path, leaf in flat.items():
        base, name = path.rsplit("/", 1)
        modules.setdefault(base, {})[name] = leaf
    state: Dict[str, np.ndarray] = {}
    for base, leaves in modules.items():
        for rx, key_fn, w_transform in _RULES:
            m = rx.match(base)
            if m:
                torch_key = key_fn(m)
                state[f"{torch_key}.weight"] = np.ascontiguousarray(
                    w_transform(leaves["kernel"]), dtype=np.float32)
                state[f"{torch_key}.bias"] = np.ascontiguousarray(
                    np.asarray(leaves["bias"]), dtype=np.float32)
                break
        else:
            raise KeyError(f"unmapped param module for export: {base}")
    return state


def save_reference_checkpoint(path: str, params: Mapping[str, Any],
                              epoch: int = 0) -> str:
    """Write a reference-format checkpoint-{epoch}.tar loadable by the
    unmodified reference model/inference.py."""
    import torch

    # np.array copy: jax arrays convert to non-writable numpy views, which
    # torch.from_numpy refuses to wrap cleanly
    state = {k: torch.from_numpy(np.array(v))
             for k, v in to_state_dict(params).items()}
    torch.save({"epoch": epoch, "state_dict": state, "optimizer": None}, path)
    return path
