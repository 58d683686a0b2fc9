"""splatter360_tpu — a TPU-native (JAX/XLA/Pallas) generalizable 360° Gaussian-splatting
framework with the capabilities of thucz/splatter360 (see /root/repo/SURVEY.md).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  geometry/  — spherical/ERP/cubemap math, SH rotation, covariance building (SURVEY §2.3)
  ops/       — differentiable Gaussian rasterizer: dense reference + tiled Pallas path (§2.9)
  models/    — feed-forward encoder (backbones, cost volume, U-Nets, adapter) + decoder (§2.4-2.5)
  data/      — chunked scene datasets, view samplers, batch contract (§2.2)
  train/     — losses, metrics, train/eval steps, checkpointing, harness (§2.6-2.7)
  parallel/  — device mesh + sharding for multi-chip training (§2.10)
  utils/     — benchmarking, image/video IO, PLY export, misc (§2.8)
"""

__version__ = "0.1.0"
