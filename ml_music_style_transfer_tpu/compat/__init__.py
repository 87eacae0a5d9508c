"""Migration compatibility: reference (PyTorch) checkpoints, both ways."""
from . import torch_import  # noqa: F401
from . import torch_export  # noqa: F401
from .torch_import import convert_state_dict, load_reference_checkpoint  # noqa: F401
from .torch_export import save_reference_checkpoint, to_state_dict  # noqa: F401
