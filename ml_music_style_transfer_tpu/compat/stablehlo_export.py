"""StableHLO deployment artifacts via jax.export.

The reference deploys by shipping the Python model code + a torch
checkpoint (model/inference.py:22-38 rebuilds the nn.Module and
load_state_dict's into it). The TPU-native deployment story is an ahead-of-
time compiled, self-describing artifact instead: ``jax.export`` serializes
the jitted forward (and the Griffin-Lim synthesis program) as versioned
StableHLO that any PJRT runtime — Python-less C++ servers included — can
load and run, with the checkpoint params passed as ordinary arguments.

Two artifacts:
  - forward: (params, midi, cond, onoff) -> log-power spec, the
    deterministic serving forward (reference model/inference.py:74-91).
  - griffinlim: log-power spec -> waveform at a fixed iteration count
    (reference model/inference.py:105-110).

Params ride as ARGUMENTS (not baked constants): the artifact stays small
(~1 MB), one artifact serves every checkpoint of the experiment, and the
weights keep living in the framework-agnostic msgpack/orbax/torch formats.
"""
from __future__ import annotations

import json
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def _forward_fn(model_cfg: ModelConfig):
    from ..models import PerformanceNet

    model = PerformanceNet(model_cfg)

    def fwd(params, midi, cond, onoff):
        return model.apply(params, midi, cond, onoff, deterministic=True)

    return model, fwd


def export_forward(model_cfg: ModelConfig, t: int = 860, batch: int = 1,
                   platforms: Sequence[str] | None = None):
    """Export the deterministic serving forward as a jax.export.Exported."""
    model, fwd = _forward_fn(model_cfg)
    f32 = jnp.float32
    midi = jax.ShapeDtypeStruct((batch, t, model_cfg.start_channels), f32)
    cond = jax.ShapeDtypeStruct((batch, t, model_cfg.start_audio_channels), f32)
    onoff = jax.ShapeDtypeStruct((batch, t, model_cfg.start_channels), f32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), midi, cond, onoff)
    return jax.export.export(jax.jit(fwd), platforms=platforms)(
        params, midi, cond, onoff)


def export_griffinlim(n_iter: int = 300, bins: int = 1025, frames: int = 860,
                      hop_length: int = 256, clip_max: float = 20.0,
                      platforms: Sequence[str] | None = None):
    """Export log-power-spec -> waveform synthesis (fixed shapes/iters).

    The transform pair resolves at EXPORT time per target platform family:
    exporting with platforms=["tpu"] bakes the matmul-DFT path, ["cpu"] the
    FFT path (ops/griffinlim.resolve_transform reads the current backend, so
    cross-platform exports should pin ``transform`` explicitly — this
    function pins it to the first requested platform's resolution).
    """
    from ..ops import griffinlim as jgl

    if platforms and platforms[0].lower() == "tpu":
        transform = "dft"
    elif platforms:
        transform = "fft"
    else:
        transform = None  # current-backend auto-resolution

    # pin the Pallas glue OFF for cross-platform exports: it is a TPU-only
    # Mosaic kernel and its auto-rule reads the CURRENT backend, which would
    # bake it into e.g. a cpu-platform artifact exported from a TPU session.
    # (On the dft path it is off anyway; the matmul dtype inside _gl_steps_dft
    # also reads the current backend — exporting a TPU artifact from a CPU
    # host produces f32 matmuls: correct, modestly slower than bf16.)
    glue = False if platforms else None

    def synth(spec, key):
        mag = jnp.sqrt(jnp.expm1(jnp.clip(spec, 0.0, clip_max)))
        return jgl.griffinlim(mag, key=key, n_iter=n_iter,
                              hop_length=hop_length, transform=transform,
                              use_pallas_glue=glue)

    spec = jax.ShapeDtypeStruct((bins, frames), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.export.export(jax.jit(synth), platforms=platforms)(spec, key)


def write_artifacts(out_dir: str, model_cfg: ModelConfig, t: int = 860,
                    batch: int = 1, n_iter: int = 300, frames: int = 860,
                    platforms: Sequence[str] | None = None) -> dict:
    """Serialize forward + griffinlim artifacts + a manifest into out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    fwd = export_forward(model_cfg, t=t, batch=batch, platforms=platforms)
    gl = export_griffinlim(n_iter=n_iter, frames=frames, platforms=platforms)
    paths = {}
    for name, exp in (("forward", fwd), ("griffinlim", gl)):
        p = os.path.join(out_dir, f"{name}.stablehlo")
        with open(p, "wb") as f:
            f.write(bytes(exp.serialize()))
        paths[name] = p
    manifest = {
        "jax_version": jax.__version__,
        "platforms": list(fwd.platforms),
        "calling_convention_version": fwd.calling_convention_version,
        "forward": {"t": t, "batch": batch,
                    "width_mult": model_cfg.width_mult,
                    "compat_mbr_noop": model_cfg.compat_mbr_noop},
        "griffinlim": {"n_iter": n_iter, "frames": frames},
    }
    mp = os.path.join(out_dir, "manifest.json")
    with open(mp, "w") as f:
        json.dump(manifest, f, indent=2)
    paths["manifest"] = mp
    return paths


def load_artifact(path: str):
    """Deserialize a .stablehlo artifact back to a callable Exported."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))
