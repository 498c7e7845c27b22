"""Compute kernels (replaces the reference's cuda_corr / parts of cuda_ba)."""

from .corr import avg_pool2d, corr, patchify, pyramidify
from .neighbors import neighbors
from .scatter import compact_ids, segment_mean, segment_softmax, segment_sum

__all__ = [
    "avg_pool2d", "corr", "patchify", "pyramidify", "neighbors",
    "compact_ids", "segment_mean", "segment_softmax", "segment_sum",
]
