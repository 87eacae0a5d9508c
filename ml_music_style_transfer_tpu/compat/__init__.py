"""Migration compatibility: import reference (PyTorch) checkpoints."""
from . import torch_import  # noqa: F401
from .torch_import import convert_state_dict, load_reference_checkpoint  # noqa: F401
