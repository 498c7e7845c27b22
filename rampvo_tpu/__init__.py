"""rampvo_tpu — a TPU-native (JAX/XLA/Pallas) event+frame visual odometry framework.

A ground-up rebuild of the capabilities of uzh-rpg/rampvo (RAMP-VO, IROS 2024)
designed for TPU hardware: fixed-shape functional state, `lax.scan`-carried
recurrence, pure-JAX batched bundle adjustment, and XLA/Pallas correlation
kernels in place of the reference's CUDA extensions.

Layer map (mirrors reference layers, see SURVEY.md §1):
  cli/        — evaluate/train entry points         (ref: evaluate.py, train.py)
  vo/         — the VO runtime / SLAM state machine (ref: ramp/Ramp_vo.py)
  models/     — VONet, encoders, update operator    (ref: ramp/net.py, extractor.py)
  ba/         — bundle adjustment                   (ref: ramp/ba.py, ramp/fastba/*)
  geometry/   — projective ops                      (ref: ramp/projective_ops.py)
  lie/        — SE3/SO3/Sim3/RxSO3                  (ref: ramp/lietorch/*)
  ops/        — correlation / patchify kernels      (ref: ramp/altcorr/*)
  data/       — event containers + datasets         (ref: data/*, ramp/data_readers/*)
  parallel/   — device-mesh scale-out (ICI/DCN)     (ref: none; TPU-native addition)
  train/      — losses + training loop              (ref: train.py)
  ckpt/       — orbax checkpoints + .pth import     (ref: torch.save/load paths)
"""

__version__ = "0.1.0"
