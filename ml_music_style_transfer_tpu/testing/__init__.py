"""Test/demo utilities: synthetic dataset rendering."""
from . import synthetic  # noqa: F401
