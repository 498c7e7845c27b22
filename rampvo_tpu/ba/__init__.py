"""Bundle adjustment (pure JAX, fixed shapes, jit-safe).

One linearization core serves both of the reference's BA backends:
  - training BA   (ref: ramp/ba.py:86-182)        -> `ba_train` (differentiable)
  - inference BA  (ref: ramp/fastba/ba_cuda.cu)    -> `ba_infer` (GN iterations)
"""

from .core import ba_infer, ba_train, linearize_center

__all__ = ["ba_train", "ba_infer", "linearize_center"]
