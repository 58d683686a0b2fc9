"""Offline dataset synthesis (the reference's `preprocess/` layer, TPU-native).

The reference generates its HM3D/Replica training data with Habitat-sim on EGL
GPUs (SURVEY.md §3.4: /root/reference/preprocess/dataset_generation/
dataset_generation_different_content_mp.py — navigable start/goal sampling,
shortest-path trajectories, per-frame 6-face cubemap RGB-D renders, cubemap→ERP
stitching, zero-ratio filtering, chunk conversion). Habitat and its scan assets
are GPU/CUDA-bound and not redistributable, so this module reproduces the
*pipeline* on procedural scenes rendered with our own differentiable renderer:

  scene_builder  — procedural room worlds as dense Gaussian surfaces
  trajectory     — free-space start/goal sampling + waypoint paths + 6D pose
                   interpolation (interpolate_trajectory.py parity)
  generate       — cube-rig render + stitch (or direct ERP), zero-ratio filter,
                   shard writing

The generated scenes use the exact data contract of the real datasets
(save_scene → .s3z/npz shards: ERP RGB u8, ERP depth mm u16, c2w poses), so the
whole training/eval stack runs on them unchanged.
"""

from .generate import generate_scene  # noqa: F401
from .scene_builder import build_room_world  # noqa: F401
from .trajectory import sample_trajectory  # noqa: F401
from .validate import check_scene_consistency  # noqa: F401
