"""Compute kernels (replaces the reference's cuda_corr / parts of cuda_ba)."""

from .corr import avg_pool2d, corr, corr_stack, patchify, pyramidify
from .corr_pallas import corr_lattice2, corr_lattice_fused2
from .neighbors import neighbors
from .scatter import compact_ids, segment_mean, segment_softmax, segment_sum

__all__ = [
    "avg_pool2d", "corr", "corr_stack",
    "corr_lattice2", "corr_lattice_fused2",
    "patchify", "pyramidify", "neighbors",
    "compact_ids", "segment_mean", "segment_softmax", "segment_sum",
]
