"""Device-mesh scale-out (TPU-native addition; the reference is single-GPU,
SURVEY.md §2.3)."""

from .eval_fleet import parse_shard, run_fleet, shard_scenes
from .mesh import make_mesh, shard_batch, make_train_step, eval_shard_scenes

__all__ = [
    "make_mesh", "shard_batch", "make_train_step", "eval_shard_scenes",
    "run_fleet", "parse_shard", "shard_scenes",
]
