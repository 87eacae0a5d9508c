"""Parallelism: device mesh, sharding rules, distributed train-step wiring."""
from . import mesh  # noqa: F401
from . import gl_shard  # noqa: F401
