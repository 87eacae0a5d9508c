"""Utilities: profiling/tracing, structured logging."""
from . import logging, profiling  # noqa: F401
