"""Training: unrolled VO forward, losses, optimizer loop (ref: train.py, net.py:252-378)."""

from .forward import TrainForward, edge_schedule
from .loss import kabsch_umeyama_scale, pose_loss_terms

__all__ = ["TrainForward", "edge_schedule", "kabsch_umeyama_scale", "pose_loss_terms"]
