"""Batch data contract (SURVEY.md §2.2 parity, channels-last).

Per example (mirrors dataset_hm3d.py:280-314, NHWC instead of NCHW, cube faces in the
canonical FRBLUD order used for supervision):
  context/target dicts with:
    extrinsics_sphere [v, 4, 4]   ERP c2w (OpenCV-convention world)
    image_sphere      [v, H, W, 3]
    image_cubes       [v, 6, Hc, Wc, 3]   (context: model input; target: supervision)
    depth_sphere      [v, H, W]           (distance along ray; 0 = hole)
    near, far         [v]
    index             [v] int32 frame indices
  scene: str (host-side only; stripped before jit)
"""

from __future__ import annotations

from typing import Any, Dict

Example = Dict[str, Any]


CONTEXT_KEYS = (
    "extrinsics_sphere",
    "image_sphere",
    "image_cubes",
    "depth_sphere",
    "near",
    "far",
    "index",
)
