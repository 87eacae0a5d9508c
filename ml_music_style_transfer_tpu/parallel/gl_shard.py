"""Time-sharded Griffin-Lim: multi-chip phase recovery for ONE long clip.

parallel/time_shard.py scales the whole-clip FORWARD past a chip (round 2);
Griffin-Lim — the serving bottleneck (BASELINE.md: 969 ms on-device of the
1.25 s serve, FFT-bound) — still ran gathered on one device, so long-clip
serving time was flat in the mesh. This module shards GL itself over the
time axis:

  - every device runs the per-chip-optimal GL program (ops/griffinlim.py,
    Pallas glue included) over its LOCAL frames plus an ``halo``-frame
    ring-exchanged context per side;
  - all devices initialize phase from ONE shared global random field
    (generated sharded, halo-exchanged like the magnitudes). This is the
    load-bearing trick: with identical inits and identical magnitudes in
    the overlap, neighboring shards' iterates stay phase-COHERENT near the
    seam, so blending them is constructive. Independent per-shard inits
    measured 1.2-2x the single-device spectral error (incoherent overlap
    audio partially cancels in the crossfade) — kept as a warning here;
  - each device keeps the waveform for its own frame range; across each
    seam the left neighbor's rendering of the first ``(halo-1)*hop``
    samples is ppermuted over and raised-cosine crossfaded in.

No collectives inside the GL iterations — three ppermutes total (magnitude
+ phase halos in, seam audio out), so N-device throughput on one clip is
~N× at the compute level. Exactness: a 1-device mesh is bit-identical to
the gathered single-device program (same PRNGKey(seed) phase field); for
N>1 finite halos leave a small seam disagreement that the crossfade
absorbs — quality is held to the single-device SPECTRAL standard
(tests/test_gl_shard.py). The reference has no counterpart (its GL is a
host librosa loop, model/inference.py:105-110).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import griffinlim as jgl
from ..ops import stft as _stft

# mesh registry (Mesh objects don't hash stably across re-creation)
_MESHES: dict = {}


def _mesh_key(mesh: Mesh):
    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat),
           mesh.axis_names)
    _MESHES[key] = mesh
    return key


def _ring_perm(n: int, shift: int):
    return [(i, (i + shift) % n) for i in range(n)]


def _halo_ext(x_local, axis_name: str, n: int, halo: int):
    """(t_loc, bins) shard -> (t_loc + 2*halo, bins) with ring halos; global
    clip edges see zeros (log-power 0 = silence; phase there is inert)."""
    idx = jax.lax.axis_index(axis_name)
    from_left = jax.lax.ppermute(x_local[-halo:], axis_name, _ring_perm(n, 1))
    from_right = jax.lax.ppermute(x_local[:halo], axis_name, _ring_perm(n, -1))
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=0)


@functools.lru_cache(maxsize=None)
def _sharded_gl_jit(mesh_key, axis_name: str, n_iter: int, hop: int,
                    clip_max: float, halo: int, rounds: int):
    mesh = _MESHES[mesh_key]
    n = mesh.shape[axis_name]
    blend = (halo - 1) * hop  # longest seam audio a neighbor's GL covers
    # iteration blocks per Schwarz round (remainder to the last round)
    k = max(1, n_iter // rounds)
    blocks = [k] * (n_iter // k)
    if sum(blocks) < n_iter:
        blocks[-1] += n_iter - sum(blocks)

    def refresh(x, t_loc):
        """Overwrite the halo columns of a (bins, t_ext) carry with the
        neighbors' freshly-iterated INTERIOR edge columns (ring exchange;
        global clip edges keep zeros — zero magnitude makes them inert)."""
        idx = jax.lax.axis_index(axis_name)
        interior = x[:, halo : halo + t_loc]
        from_left = jax.lax.ppermute(
            interior[:, -halo:], axis_name, _ring_perm(n, 1))
        from_right = jax.lax.ppermute(
            interior[:, :halo], axis_name, _ring_perm(n, -1))
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                               from_right)
        return jnp.concatenate([from_left, interior, from_right], axis=1)

    def local(spec_local, phase_local):
        # (t_loc, bins) log-power + shared-global phase, this shard's range
        t_loc = spec_local.shape[0]
        idx = jax.lax.axis_index(axis_name)
        ext = _halo_ext(spec_local, axis_name, n, halo)
        ext_phase = jnp.swapaxes(_halo_ext(phase_local, axis_name, n, halo),
                                 -1, -2)
        magnitude = _stft.inverse_log_power(jnp.swapaxes(ext, -1, -2), clip_max)
        n_fft = 2 * (magnitude.shape[-2] - 1)
        transform = jgl.resolve_transform(magnitude.ndim, n_fft, n_fft, None)
        glue = (transform != "dft" and
                jgl.resolve_pallas_glue(magnitude.shape[-1], n_fft, hop, n_fft))
        carry = (jax.lax.complex(jnp.cos(ext_phase), jnp.sin(ext_phase)),
                 jnp.zeros(magnitude.shape, jnp.complex64))
        # Schwarz rounds: blocks of plain GL iterations separated by a halo
        # refresh of the full carry, so each shard's boundary condition
        # tracks the solution its neighbor is actually converging to. One
        # uninterrupted n_iter run diverges at the seams instead (measured
        # ~1.5-2x the single-device spectral error at n_iter 100-300).
        for r, n_block in enumerate(blocks):
            carry = jgl.gl_steps(magnitude, carry, n_block, hop, n_fft,
                                 use_pallas_glue=glue, transform=transform)
            if r < len(blocks) - 1:
                carry = (refresh(carry[0], t_loc), refresh(carry[1], t_loc))
        wav_ext = _stft.istft(magnitude * carry[0], hop, n_fft)
        # frame f of ext centers at sample f*hop: my region is [halo*hop,
        # (halo+t_loc)*hop); my rendering of the RIGHT neighbor's first
        # `blend` samples follows immediately after
        mine = jax.lax.dynamic_slice(wav_ext, (halo * hop,), (t_loc * hop,))
        tail = jax.lax.dynamic_slice(wav_ext, ((halo + t_loc) * hop,), (blend,))
        neighbor_head = jax.lax.ppermute(tail, axis_name, _ring_perm(n, 1))
        # raised-cosine crossfade at the seam (skip: shard 0 has no left)
        w = 0.5 - 0.5 * jnp.cos(jnp.pi * (jnp.arange(blend) + 1) / (blend + 1))
        head = jnp.where(idx == 0, mine[:blend],
                         w * mine[:blend] + (1.0 - w) * neighbor_head)
        return jnp.concatenate([head, mine[blend:]])

    # check_vma=False: the Pallas GL glue's out_shapes carry no vma (same
    # reason as infer/bulk.py's batched GL; CPU-pinned regression there)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis_name, None), P(axis_name, None)),
                   out_specs=P(axis_name), check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _phase_field_jit(mesh_key, axis_name: str):
    """Sharded generation of the shared global phase-init field. Threefry is
    counter-based, so GSPMD partitions generation without materializing the
    full (bins, T) field anywhere; laid out exactly like griffinlim's own
    internal init (uniform over (bins, T) from the raw seed key) so a
    1-device mesh reproduces the gathered program bit-for-bit."""
    mesh = _MESHES[mesh_key]

    def gen(seed, bins, t_frames):
        phase = 2.0 * jnp.pi * jax.random.uniform(
            jax.random.PRNGKey(seed), (bins, t_frames))
        return jnp.swapaxes(phase, -1, -2)  # (T, bins), sharded on T

    return jax.jit(
        gen, static_argnums=(1, 2),
        out_shardings=NamedSharding(mesh, P(axis_name, None)))


def sharded_griffinlim_from_log_power(
    spec, mesh: Mesh, axis_name: str = "time", n_iter: int = 300,
    hop_length: int = 256, clip_max: float = 20.0, halo: int = 32,
    seed: int = 0, rounds: int = 10,
):
    """(T, bins) log-power spec, T divisible by the mesh axis -> (T*hop,)
    waveform, with GL running concurrently on every device of ``mesh``.

    On a 1-device mesh this is bit-identical to the gathered single-device
    program with ``key=PRNGKey(seed)``. ``halo`` is the per-side frame
    context (default 32 ≈ 0.19 s at hop 256); ``rounds`` the number of
    Schwarz blocks (halo refreshes) the iteration budget is split into.
    Measured on the 8-device mesh (12 s harmonic clip): sharded spectral
    error 0.0588 vs single-device 0.0588 at n_iter=100, halo=32, rounds=10.
    """
    n = mesh.shape[axis_name]
    spec = jnp.asarray(spec, jnp.float32)
    t_frames, bins = spec.shape
    if n == 1:
        wav = jgl.griffinlim_from_log_power(
            jnp.swapaxes(spec, -1, -2), key=jax.random.PRNGKey(seed),
            n_iter=n_iter, hop_length=hop_length, clip_max=clip_max)
        return jnp.pad(wav, (0, t_frames * hop_length - wav.shape[0]))
    if t_frames % n:
        raise ValueError(f"frame count {t_frames} must divide the mesh "
                         f"axis '{axis_name}' size {n} (pad the spec)")
    if t_frames // n <= halo:
        raise ValueError(f"local shard {t_frames // n} frames <= halo "
                         f"{halo}; use fewer devices or a smaller halo")
    mk = _mesh_key(mesh)
    phase = _phase_field_jit(mk, axis_name)(seed, bins, t_frames)
    spec = jax.device_put(spec, NamedSharding(mesh, P(axis_name, None)))
    fn = _sharded_gl_jit(mk, axis_name, n_iter, hop_length, clip_max, halo,
                         rounds)
    return fn(spec, phase)
