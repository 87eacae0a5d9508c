"""Hand-written Pallas TPU kernels for the hot blocks."""
from . import fused_conv  # noqa: F401
