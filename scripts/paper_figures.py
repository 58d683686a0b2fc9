"""Paper-figure generation: orthographic point-cloud / teaser renders.

TPU-native analogue of the reference's figure tooling (/root/reference/src/paper/*,
~1.4k LoC of per-figure scripts built on `render_cuda_orthographic`,
src/model/decoder/cuda_splatting.py:129-221): predict Gaussians for a scene, then
render them from overhead/side orthographic cameras plus the ERP novel view, and
compose a labeled sheet.

Usage:
  python scripts/paper_figures.py <config.yaml> [overrides...] --out figures/
  python scripts/paper_figures.py --synthetic --out figures/   # no data needed
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ortho_pose(kind: str, distance: float) -> np.ndarray:
    """c2w for an orthographic rig looking at the origin along an axis."""
    c2w = np.eye(4, dtype=np.float32)
    if kind == "top":  # camera +z (view dir) points world -y (down)
        c2w[:3, :3] = np.array(
            [[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float32
        )
        c2w[:3, 3] = [0.0, distance, 0.0]
    elif kind == "side":  # looking along world -x
        c2w[:3, :3] = np.array(
            [[0, 0, -1], [0, 1, 0], [1, 0, 0]], dtype=np.float32
        )
        c2w[:3, 3] = [distance, 0.0, 0.0]
    else:
        raise ValueError(kind)
    return c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("overrides", nargs="*", default=[])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="figures")
    ap.add_argument("--extent", type=float, default=8.0,
                    help="world-space side of the orthographic window")
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from splatter360_tpu.ops.rasterizer_ref import render_dense
    from splatter360_tpu.utils.image_io import (
        add_label, hcat, save_image, to_uint8,
    )

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic or args.config is None:
        from splatter360_tpu.data.synthetic import random_gaussians

        g = random_gaussians(
            jax.random.PRNGKey(3), 40_000, sh_degree=2,
            radius_range=(0.5, 4.0), scale_range=(0.01, 0.05),
        )
        means, covs, sh, op = (
            g["means"], g["covariances"], g["harmonics"], g["opacities"])
        erp_pose = jnp.eye(4)
    else:
        from splatter360_tpu.config import load_config
        from splatter360_tpu.train.evaluator import predict_scene_gaussians

        cfg = load_config(args.config, args.overrides)
        means, covs, sh, op, erp_pose = predict_scene_gaussians(cfg)

    shape = (args.res, args.res)
    panels = []
    for kind in ("top", "side"):
        c2w = jnp.asarray(_ortho_pose(kind, 0.5 * args.extent))
        out = render_dense(
            means, covs, sh, op, c2w, shape, camera_kind="ortho",
            ortho_extent=args.extent,
            background=jnp.ones((3,)),
        )
        img = to_uint8(np.asarray(out.color))
        save_image(img, os.path.join(args.out, f"pointcloud_{kind}.png"))
        panels.append(add_label(img, f"ortho {kind}"))

    erp = render_dense(
        means, covs, sh, op, erp_pose, (args.res // 2, args.res),
        camera_kind="erp",
    )
    erp_img = to_uint8(np.asarray(erp.color))
    save_image(erp_img, os.path.join(args.out, "erp_view.png"))

    sheet = hcat(*panels, pad=4)
    save_image(sheet, os.path.join(args.out, "teaser.png"))
    print(f"wrote {args.out}/pointcloud_top.png, pointcloud_side.png, "
          f"erp_view.png, teaser.png")


if __name__ == "__main__":
    main()
