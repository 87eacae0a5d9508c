"""Bulk (multi-clip) synthesis scaled out over the data mesh.

The reference synthesizes one clip at a time on one device
(model/inference.py:74-110). On a single chip the per-clip optimum is
already in ops/griffinlim.py (a 10 s clip saturates the chip; the 3D path
lax.maps clips sequentially through one dispatch). This module adds the
multi-chip scale-out that path defers to: shard a BATCH of clips over the
mesh's ``data`` axis so each device runs its local clips with the
per-chip-optimal program — clip throughput scales ~linearly with the data
axis because the work is embarrassingly parallel (no collectives in the GL
loop; the forward is ordinary GSPMD data parallelism).

Phase seeds are explicit and per-clip, so results are independent of how
many devices the batch is sharded over (parity-tested on the virtual mesh,
tests/test_bulk_synthesis.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, DSPConfig, DEFAULT_DSP
from ..ops import griffinlim as jgl


def _data_axes(mesh: Mesh):
    """The batch-sharding axes of a (data[,model]) or (dcn,data,model) mesh."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


@functools.lru_cache(maxsize=None)
def _bulk_gl_jit(mesh_key, axes, n_iter: int, hop_length: int, clip_max: float):
    mesh = _MESHES[mesh_key]

    def local(specs, seeds):
        # per-device: the per-chip-optimal sequential map over local clips
        def one(args):
            spec, seed = args
            return jgl.griffinlim_from_log_power(
                spec, key=jax.random.PRNGKey(seed), n_iter=n_iter,
                hop_length=hop_length, clip_max=clip_max)

        return jax.lax.map(one, (specs, seeds))

    spec_p = P(axes, None, None)
    # check_vma=False: GL is embarrassingly parallel (no collectives), and on
    # TPU the fused Pallas glue inside (ops/pallas/gl_glue.py) emits
    # pallas_call out_shapes without `vma`, which the varying-across-mesh
    # check rejects (CPU tests never see this — Pallas is TPU-gated).
    fn = shard_map(local, mesh=mesh, in_specs=(spec_p, P(axes)),
                   out_specs=P(axes, None), check_vma=False)
    return jax.jit(fn)


# jit-cache-friendly mesh registry: Mesh objects are unhashable across
# re-creation, so cache programs by the mesh's structural identity
_MESHES: dict = {}


def _mesh_key(mesh: Mesh):
    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat),
           mesh.axis_names)
    _MESHES[key] = mesh
    return key


def bulk_griffinlim(specs, seeds, mesh: Mesh | None = None, n_iter: int = 300,
                    hop_length: int = 256, clip_max: float = 20.0):
    """(N, bins, frames) log-power specs -> (N, samples) waveforms, with the
    clip batch sharded over the mesh's data axes.

    ``seeds``: (N,) int32 per-clip phase-init seeds — explicit so output is
    bit-identical for any device count. N must divide by the data axes'
    product. With ``mesh=None`` builds a 1-device degenerate mesh (the
    single-chip behavior, same program).
    """
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    axes = _data_axes(mesh)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    specs = jnp.asarray(specs)
    seeds = jnp.asarray(seeds, jnp.int32)
    if specs.shape[0] % n_shards:
        raise ValueError(
            f"clip batch {specs.shape[0]} must divide the data axes product "
            f"{n_shards} (pad the batch or change the mesh)")
    sharding = NamedSharding(mesh, P(axes, None, None))
    specs = jax.device_put(specs, sharding)
    seeds = jax.device_put(seeds, NamedSharding(mesh, P(axes)))
    fn = _bulk_gl_jit(_mesh_key(mesh), axes, n_iter, hop_length, clip_max)
    return fn(specs, seeds)


def batch_synthesize_waveforms(synths, n_iter: int = 300, overlap: bool = True,
                               cond_mode: str = "aligned", mesh: Mesh | None = None,
                               seeds=None):
    """Dynamic batching for the serving daemon: synthesize N requests with
    ONE Griffin-Lim dispatch per equal-length group.

    Per request the blended spectrogram is predicted device-resident
    (AudioSynthesizer._predict_device — bucketed tile counts mean repeat
    lengths reuse compiled programs), then requests whose GL frame count
    matches are stacked and inverted together via bulk_griffinlim: a single
    dispatch on one chip (~7% per-clip win, BASELINE.md), ~linear clip
    throughput over a mesh's data axes. The reference serves strictly one
    clip per process run (model/inference.py:112-129).

    ``synths``: AudioSynthesizer list (each carries its midi/audio sources).
    ``seeds``: optional per-request GL phase seeds; default 0 per clip =
    bit-parity with AudioSynthesizer.synthesize_waveform's PRNGKey(0).
    Returns ``(wavs, errors)`` both length N: per-request isolation — a
    request whose MIDI/audio fails to predict gets an error string and does
    not poison the rest (its wav is None).
    """
    n = len(synths)
    specs: list = [None] * n
    t_gls = [0] * n
    t_totals = [0] * n
    errors: list = [None] * n
    for i, s in enumerate(synths):
        try:
            spec, t_total = s._predict_device(
                s.midi_source, s.audio_source, overlap=overlap,
                cond_mode=cond_mode)
            win = s.hp.windows_per_chunk
            bucket = win // 2
            t_gls[i] = min(int(spec.shape[0]), -(-t_total // bucket) * bucket)
            specs[i] = spec
            t_totals[i] = t_total
        except Exception as e:  # noqa: BLE001 — per-request isolation
            errors[i] = f"{type(e).__name__}: {e}"

    wavs: list = [None] * n
    # group key includes the DSP config: requests with equal frame counts
    # but different n_fft/hop/clip-max must not share one GL program's
    # constants — and mismatched bin counts would make jnp.stack raise
    # OUTSIDE the per-item error isolation, failing the whole batch
    groups: dict[tuple, list[int]] = {}
    for i in range(n):
        if errors[i] is None:
            hp_i = synths[i].hp
            groups.setdefault(
                (t_gls[i], hp_i.n_fft, hp_i.ws, hp_i.clip_log_power_max),
                []).append(i)
    for (t_gl, _nfft, _ws, _cm), idxs in groups.items():
        hp = synths[idxs[0]].hp
        batch = jnp.stack([jnp.swapaxes(specs[i][:t_gl], -1, -2) for i in idxs])
        seed_vec = np.asarray(
            [0 if seeds is None else int(seeds[i]) for i in idxs], np.int32)
        # pad the group to the mesh's shard multiple (dropped after GL)
        if mesh is not None:
            n_shards = 1
            for a in _data_axes(mesh):
                n_shards *= mesh.shape[a]
            pad = -len(idxs) % n_shards
            if pad:
                batch = jnp.concatenate([batch, batch[-1:].repeat(pad, 0)])
                seed_vec = np.concatenate([seed_vec, seed_vec[-1:].repeat(pad)])
        wav_b = bulk_griffinlim(batch, seed_vec, mesh=mesh, n_iter=n_iter,
                                hop_length=hp.ws,
                                clip_max=hp.clip_log_power_max)
        wav_b = np.asarray(wav_b)
        for j, i in enumerate(idxs):
            wavs[i] = wav_b[j][: t_totals[i] * hp.ws]
    return wavs, errors


def bulk_synthesize(model_cfg: ModelConfig, params, roll, onoff, cond,
                    mesh: Mesh | None = None, n_iter: int = 300,
                    hp: DSPConfig = DEFAULT_DSP):
    """Forward + Griffin-Lim for a batch of single-chunk clips, data-parallel
    over the mesh.

    ``roll``/``onoff``: (N, 860, 128); ``cond``: (N, 860, 1025). Returns
    (N, samples) waveforms. The forward is ordinary GSPMD DP (batch-sharded
    jit of the deterministic model); GL scales out via bulk_griffinlim.
    """
    from .synthesize import _fwd_jit

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    axes = _data_axes(mesh)
    bs = NamedSharding(mesh, P(axes))
    def put(x):
        return jax.device_put(jnp.asarray(x, jnp.float32), bs)
    pred = _fwd_jit(model_cfg)(params, put(roll), put(cond), put(onoff))
    specs = jnp.swapaxes(pred, -1, -2)  # (N, bins, frames)
    seeds = jnp.arange(specs.shape[0], dtype=jnp.int32)
    return bulk_griffinlim(specs, seeds, mesh=mesh, n_iter=n_iter,
                           hop_length=hp.ws, clip_max=hp.clip_log_power_max)
