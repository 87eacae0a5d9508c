"""Hand-written Pallas TPU kernels for the hot blocks."""
from . import fused_conv  # noqa: F401
from . import dropout  # noqa: F401


def on_tpu() -> bool:
    """True when the default backend is a real TPU (incl. the axon plugin)."""
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
