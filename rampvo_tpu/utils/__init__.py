"""Evaluation metrics, timing, misc host utilities."""

from .metrics import (
    associate_trajectories,
    ate_rmse,
    rot_error_per_axis,
    umeyama_alignment,
)
from .timing import Timer

__all__ = [
    "umeyama_alignment",
    "ate_rmse",
    "rot_error_per_axis",
    "associate_trajectories",
    "Timer",
]
