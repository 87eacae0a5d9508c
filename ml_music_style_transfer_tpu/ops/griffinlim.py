"""On-device Griffin-Lim phase recovery (JAX / XLA, TPU-native).

Replaces the reference's host-CPU librosa.griffinlim loop
(model/inference.py:105-110: n_iter=300, hann window, win_length=2048,
hop_length=256) — the single biggest inference cost in the reference — with a
``lax.fori_loop`` over on-device rfft/irfft with zero host round-trips.

Algorithm: Griffin & Lim (1984) with momentum acceleration (Perraudin et al.
2013), matching librosa.griffinlim's published update rule
(momentum=0.99, random uniform phase init).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import stft as _stft


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "hop_length", "win_length", "length", "momentum",
        "use_pallas_glue", "transform",
    ),
)
def griffinlim(
    magnitude: jnp.ndarray,
    key: jax.Array | None = None,
    n_iter: int = 300,
    hop_length: int = 256,
    win_length: int | None = None,
    momentum: float = 0.99,
    length: int | None = None,
    init_phase: jnp.ndarray | None = None,
    use_pallas_glue: bool | None = None,
    transform: str | None = None,
) -> jnp.ndarray:
    """Recover a waveform from a magnitude spectrogram.

    Args:
      magnitude: (..., bins, n_frames) linear magnitude (NOT log-power; invert
        compression with ops.stft.inverse_log_power first, as the reference
        does at inference.py:109).
      key: PRNG key for the random phase init (ignored if init_phase given).
      init_phase: optional explicit phase (radians) for deterministic parity
        tests against the NumPy reference.
      transform: "fft" | "dft" | None (auto). "dft" replaces the per-iteration
        rfft/irfft with one fused MXU matmul per direction on a packed
        [Re|Im] representation — measured 6.0x faster per GL iteration on the
        v5e at the 10 s-clip shape (0.181 vs 1.090 ms, scripts/bench_dft_gl.py)
        at equal spectral error (GL renormalizes phase every iteration, so
        matmul rounding does not accumulate). Auto: "dft" on TPU for the
        supported shapes, "fft" elsewhere (CPU FFTs beat CPU matmuls).

    Returns:
      (..., samples) waveform, length ``hop_length * (n_frames - 1)`` unless
      ``length`` is given.
    """
    n_fft = 2 * (magnitude.shape[-2] - 1)
    if win_length is None:
        win_length = n_fft
    if magnitude.ndim == 3 and init_phase is None:
        # Batched clips: sequential on-device map, one dispatch. lax.map
        # beats true batching for BOTH transforms, measured on the v5e at
        # 8x10s clips: XLA's natively-batched FFTs cost 0.59 s/clip vs 0.38
        # mapped, and the batched DFT matmuls cost 4.0 ms/iter-of-8 vs 1.9
        # mapped (the 3D OLA/pad/frame glue lowers badly; the
        # (N*frames, 2*bins) matmul does not make up for it). Per-clip DFT
        # under lax.map: 0.071 s/clip for GL300.
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, magnitude.shape[0])
        return jax.lax.map(
            lambda mk: griffinlim(
                mk[0], key=mk[1], n_iter=n_iter, hop_length=hop_length,
                win_length=win_length, momentum=momentum, length=length,
                use_pallas_glue=use_pallas_glue, transform=transform,
            ),
            (magnitude, keys),
        )
    if init_phase is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        init_phase = 2.0 * jnp.pi * jax.random.uniform(key, magnitude.shape)
    angles = jax.lax.complex(jnp.cos(init_phase), jnp.sin(init_phase))
    magnitude = magnitude.astype(jnp.float32)

    # fused Pallas consistency glue (ops/pallas/gl_glue.py): one kernel for
    # the window/OLA/NOLA/crop/pad/frame data movement between the FFTs,
    # instead of ~10 HBM-materializing XLA HLOs per iteration. Auto-enabled
    # on TPU for the single-clip inference shapes it supports.
    if transform is None:
        transform = resolve_transform(magnitude.ndim, n_fft, win_length, length)
    if use_pallas_glue is None:
        from . import pallas as _pk
        from .pallas import gl_glue as _glue

        # On the DFT path the Pallas glue measures a slight net LOSS (it
        # breaks XLA's fusion between the two MXU matmuls; 0.448 vs
        # 0.421 ms/iter on the v5e) — default it off there.
        use_pallas_glue = (
            transform != "dft"
            and _pk.on_tpu()
            and magnitude.ndim == 2
            and length is None
            and win_length == n_fft
            and _glue.supported(magnitude.shape[-1], n_fft, hop_length)
        )
    rebuilt0 = jnp.zeros_like(angles)
    angles, _ = gl_steps(magnitude, (angles, rebuilt0), n_iter, hop_length,
                         win_length, momentum, use_pallas_glue, length,
                         transform)
    return _stft.istft(magnitude * angles, hop_length, win_length, length=length)


def resolve_pallas_glue(n_frames: int, n_fft: int, hop_length: int,
                        win_length: int) -> bool:
    """The auto-enable rule for the fused Pallas consistency glue
    (TPU-only, supported single-clip shapes)."""
    from . import pallas as _pk
    from .pallas import gl_glue as _glue

    return (_pk.on_tpu() and win_length == n_fft
            and _glue.supported(n_frames, n_fft, hop_length))


def resolve_transform(ndim: int, n_fft: int, win_length: int,
                      length: int | None) -> str:
    """Auto-select the per-iteration transform pair: MXU matmul-DFT on TPU
    for the supported single-clip shapes, rfft/irfft elsewhere. Measured on
    the v5e (scripts/bench_dft_gl.py): 6.0x per GL iteration over XLA's FFTs
    at equal spectral error."""
    from . import pallas as _pk

    return ("dft" if _pk.on_tpu() and ndim == 2 and length is None
            and win_length == n_fft else "fft")


# One-sided real-DFT matmul pair (shared with the forward STFT's matmul
# path; see stft._dft_matrices_host for construction + why host constants).
_dft_matrices = _stft._dft_matrices


def gl_steps(magnitude, carry, n_iter: int, hop_length: int, win_length: int,
             momentum: float = 0.99, use_pallas_glue: bool = False,
             length: int | None = None, transform: str = "fft"):
    """Run ``n_iter`` Griffin-Lim iterations on an explicit carry.

    ``carry`` is ``(angles, rebuilt_prev)``, both complex (bins, frames);
    returns the updated carry. This is the loop body of ``griffinlim``,
    exposed (pure, trace-time) so the time-sharded GL
    (parallel/gl_shard.py) can interleave iteration blocks with halo
    refreshes — its Schwarz rounds need the momentum state to survive
    across communication points.

    ``transform="dft"`` runs the loop on a packed-real [Re|Im]
    (frames, 2*bins) representation with one MXU matmul per direction
    (converted from/to the complex carry at the call boundary), keeping the
    reference update rule bit-for-bit in structure; requires
    win_length == n_fft and length is None (the supported serving shapes).
    """
    n_fft = 2 * (magnitude.shape[-2] - 1)
    eps = jnp.float32(1.1754944e-38)
    mom = jnp.float32(momentum / (1.0 + momentum))

    if transform == "dft":
        if win_length != n_fft or length is not None:
            raise ValueError("transform='dft' needs win_length == n_fft "
                             "and length=None")
        return _gl_steps_dft(magnitude, carry, n_iter, hop_length, mom, eps,
                             use_pallas_glue)

    if use_pallas_glue:
        from .pallas import gl_glue as _glue

        n_frames = magnitude.shape[-1]
        window = jnp.asarray(_stft._window_const(n_fft, win_length))
        inv_blocks = jnp.asarray(
            _stft._wss_inv_const(n_fft, win_length, hop_length, n_frames).reshape(
                n_frames + n_fft // hop_length - 1, hop_length
            )
        )

        def body(_, carry):
            angles, rebuilt_prev = carry
            frames = jnp.fft.irfft(
                jnp.swapaxes(magnitude * angles, -1, -2), n=n_fft, axis=-1
            )
            g = _glue.gl_consistency_frames(frames, window, inv_blocks)
            rebuilt = jnp.swapaxes(jnp.fft.rfft(g, axis=-1), -1, -2)
            angles = rebuilt - mom * rebuilt_prev
            angles = angles / (jnp.abs(angles) + eps)
            return angles, rebuilt

    else:

        def body(_, carry):
            angles, rebuilt_prev = carry
            inverse = _stft.istft(
                magnitude * angles, hop_length, win_length, length=length
            )
            rebuilt = _stft.stft(inverse, n_fft, hop_length, win_length)
            angles = rebuilt - mom * rebuilt_prev
            angles = angles / (jnp.abs(angles) + eps)
            return angles, rebuilt

    return jax.lax.fori_loop(0, n_iter, body, carry)


def _gl_steps_dft(magnitude, carry, n_iter: int, hop: int, mom, eps,
                  use_pallas_glue: bool):
    """Griffin-Lim iteration block with matmul-DFT transforms (MXU path).

    The loop state is packed real: (..., frames, 2*bins) [Re | Im],
    unit-modulus per (re, im) pair for ``angles``. The complex
    (..., bins, frames) carry is converted at the boundaries only, so
    callers (incl. the time-sharded GL's Schwarz rounds) keep their
    interface. Leading batch dims ride the SAME matmul — XLA folds
    (N, frames, 2*bins) @ (2*bins, n_fft) into one (N*frames, ...) MXU
    matmul, which is how batched multi-clip GL beats the lax.map path.
    bf16 matmul inputs with f32 accumulation on TPU — GL's per-iteration
    renormalization absorbs the rounding (measured equal spectral error,
    scripts/bench_dft_gl.py); f32 inputs elsewhere so the CPU test mesh
    stays accurate.
    """
    from . import pallas as _pk

    bins, n_frames = magnitude.shape[-2], magnitude.shape[-1]
    n_fft = 2 * (bins - 1)
    in_dtype = jnp.bfloat16 if _pk.on_tpu() else jnp.float32
    fwd, inv = _dft_matrices(n_fft, in_dtype)
    mag_t = jnp.swapaxes(magnitude, -1, -2)  # (..., frames, bins)

    def pack(z):  # complex (..., bins, frames) -> real (..., frames, 2*bins)
        return jnp.swapaxes(
            jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-2), -1, -2)

    def unpack(p):  # real (..., frames, 2*bins) -> complex (..., bins, frames)
        return jnp.swapaxes(
            jax.lax.complex(p[..., :bins], p[..., bins:]), -1, -2)

    if use_pallas_glue:
        from .pallas import gl_glue as _glue

        window = jnp.asarray(_stft._window_const(n_fft, n_fft))
        inv_blocks = jnp.asarray(
            _stft._wss_inv_const(n_fft, n_fft, hop, n_frames).reshape(
                n_frames + n_fft // hop - 1, hop))

        def glue(frames):
            return _glue.gl_consistency_frames(frames, window, inv_blocks)

    else:
        window = jnp.asarray(_stft._window_const(n_fft, n_fft))
        inv_wss = jnp.asarray(_stft._wss_inv_const(n_fft, n_fft, hop, n_frames))

        def glue(frames):
            # istft tail + stft head minus the FFTs (center=True):
            # window -> OLA -> /WSS -> crop -> reflect pad -> frame -> window
            y = _stft._overlap_add(frames * window, hop) * inv_wss
            y = y[..., n_fft // 2 : y.shape[-1] - n_fft // 2]
            pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
            y = jnp.pad(y, pad, mode="reflect")
            return _stft._frame_dense(y, n_fft, hop, n_frames) * window

    def body(_, c):
        ang, reb_prev = c
        spec = jnp.concatenate(
            [ang[..., :bins] * mag_t, ang[..., bins:] * mag_t], axis=-1)
        frames = jnp.dot(spec.astype(in_dtype), inv,
                         preferred_element_type=jnp.float32)
        reb = jnp.dot(glue(frames).astype(in_dtype), fwd,
                      preferred_element_type=jnp.float32)
        a = reb - mom * reb_prev
        norm = jnp.sqrt(a[..., :bins] ** 2 + a[..., bins:] ** 2) + eps
        ang = jnp.concatenate([a[..., :bins] / norm, a[..., bins:] / norm],
                              axis=-1)
        return ang, reb

    carry = (pack(carry[0]), pack(carry[1]))
    ang, reb = jax.lax.fori_loop(0, n_iter, body, carry)
    return unpack(ang), unpack(reb)


def griffinlim_from_log_power(
    spec: jnp.ndarray,
    key: jax.Array | None = None,
    n_iter: int = 300,
    hop_length: int = 256,
    clip_max: float = 20.0,
    length: int | None = None,
) -> jnp.ndarray:
    """Full reference synthesis path: log-power spec -> waveform.

    Fuses the compression inverse (inference.py:109) and Griffin-Lim
    (inference.py:110) into one jitted on-device program.
    """
    magnitude = _stft.inverse_log_power(spec, clip_max)
    return griffinlim(
        magnitude, key=key, n_iter=n_iter, hop_length=hop_length, length=length
    )
