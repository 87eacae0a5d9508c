"""Inference: checkpoint loading, chunked forward, on-device Griffin-Lim."""
from . import synthesize  # noqa: F401
from .synthesize import AudioSynthesizer  # noqa: F401
