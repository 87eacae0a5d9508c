"""Training: jitted sharded steps, plateau LR, checkpoints, experiment mgmt."""
from . import checkpoint, losses, loop, schedule  # noqa: F401
