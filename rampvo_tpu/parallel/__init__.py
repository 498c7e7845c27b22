"""Device-mesh scale-out (TPU-native addition; the reference is single-GPU,
SURVEY.md §2.3)."""

from .mesh import make_mesh, shard_batch, make_train_step, eval_shard_scenes

__all__ = ["make_mesh", "shard_batch", "make_train_step", "eval_shard_scenes"]
