"""Checkpointing: .pth import (published reference checkpoints) + orbax."""

from .torch_import import import_pth, map_state_dict
from .orbax_io import save_checkpoint, restore_checkpoint

__all__ = ["import_pth", "map_state_dict", "save_checkpoint", "restore_checkpoint"]
