"""Scene storage: chunked npz scene files + converters + synthetic scene rendering.

Replaces the reference's `.torch` chunk layout (SURVEY.md §2.2, §3.4): each scene is a
single compressed npz holding the whole trajectory; an index.json lists scenes per
split. Layout:

  root/<split>/index.json                 {"scenes": ["scene_a", ...]}
  root/<split>/<scene>.npz                rgb [n,H,W,3] u8, depth_mm [n,H,W] u16,
                                          poses [n,4,4] f32 (ERP c2w)

`convert_reference_scene` converts the reference's HM3D preprocessing output
(pano/%05d.png + pano_depth mm PNGs + rotation.npy/translation.npy,
preprocess/dataset_generation_*.py) into this layout.

`write_synthetic_scene` renders a random Gaussian world along a smooth trajectory with
the dense oracle renderer — geometry-consistent RGB-D panoramas for end-to-end tests,
overfit sanity runs, and benchmarks (no HM3D access required).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def save_scene(root, split, scene, rgb_u8, depth_mm_u16, poses):
    d = Path(root) / split
    d.mkdir(parents=True, exist_ok=True)
    from .. import native

    if native.available():
        native.write_shard(
            d / f"{scene}.s3z",
            rgb_u8.astype(np.uint8),
            depth_mm_u16.astype(np.uint16),
            poses.astype(np.float32),
        )
    else:
        np.savez_compressed(
            d / f"{scene}.npz",
            rgb=rgb_u8.astype(np.uint8),
            depth_mm=depth_mm_u16.astype(np.uint16),
            poses=poses.astype(np.float32),
        )
    idx_path = d / "index.json"
    idx = {"scenes": []}
    if idx_path.exists():
        idx = json.loads(idx_path.read_text())
    if scene not in idx["scenes"]:
        idx["scenes"].append(scene)
        idx_path.write_text(json.dumps(idx, indent=1))


def load_scene(root, split, scene):
    s3z = Path(root) / split / f"{scene}.s3z"
    if s3z.exists():
        from .. import native

        shard = native.Shard(s3z)
        rgb, depth = shard.decode(list(range(shard.n_frames)))
        poses = shard.poses()
        shard.close()
        return {
            "rgb": rgb,
            "depth_m": depth.astype(np.float32) / 1000.0,
            "poses": poses,
        }
    with np.load(Path(root) / split / f"{scene}.npz") as z:
        return {
            "rgb": z["rgb"],
            "depth_m": z["depth_mm"].astype(np.float32) / 1000.0,
            "poses": z["poses"],
        }


def list_scenes(root, split):
    idx_path = Path(root) / split / "index.json"
    if not idx_path.exists():
        return []
    return json.loads(idx_path.read_text())["scenes"]


def convert_reference_scene(scene_dir: str, root: str, split: str, scene: str):
    """Convert a reference-format scene directory (pano/, pano_depth/, rotation.npy,
    translation.npy) into our npz layout."""
    import cv2

    sd = Path(scene_dir)
    rot = np.load(sd / "rotation.npy")        # [n, 3, 3]
    trans = np.load(sd / "translation.npy")   # [n, 3]
    n = rot.shape[0]
    rgbs, depths = [], []
    for i in range(n):
        img = cv2.imread(str(sd / "pano" / f"{i:05d}.png"), cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        dep = cv2.imread(
            str(sd / "pano_depth" / f"{i:05d}.png"), cv2.IMREAD_UNCHANGED
        )
        rgbs.append(img)
        depths.append(dep.astype(np.uint16))
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, :3, :3] = rot
    poses[:, :3, 3] = trans
    save_scene(root, split, scene, np.stack(rgbs), np.stack(depths), poses)


def export_reference_layout(root, split: str, scene: str, out_dir: str):
    """Write one of OUR stored scenes back out in the reference generator's
    exact on-disk layout (pano/%05d.png, pano_depth/%05d.png uint16 mm,
    rotation.npy, translation.npy — /root/reference/preprocess/
    dataset_generation output, SURVEY.md §3.4). Used by the reference-format
    pipeline artifact (scripts/pipeline_reference_format.py) to drive
    convert_reference_scene over the same bytes real HM3D data would have."""
    import cv2

    data = load_scene(root, split, scene)
    out = Path(out_dir)
    (out / "pano").mkdir(parents=True, exist_ok=True)
    (out / "pano_depth").mkdir(exist_ok=True)
    rgb = data["rgb"]
    # rint, not truncation: depth_m is mm/1000, and 4.999 m * 1000 can land
    # at 4999.9999 in f32 — astype alone would drop a whole millimetre
    depth_mm = np.clip(
        np.rint(data["depth_m"] * 1000.0), 0, 65535
    ).astype(np.uint16)
    for i in range(rgb.shape[0]):
        cv2.imwrite(str(out / "pano" / f"{i:05d}.png"),
                    cv2.cvtColor(rgb[i], cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(out / "pano_depth" / f"{i:05d}.png"), depth_mm[i])
    np.save(out / "rotation.npy", data["poses"][:, :3, :3])
    np.save(out / "translation.npy", data["poses"][:, :3, 3])


def write_synthetic_scene(
    root,
    split: str = "train",
    scene: str = "synth0",
    n_frames: int = 32,
    image_shape: tuple[int, int] = (128, 256),
    n_gaussians: int = 4000,
    seed: int = 0,
):
    """Render a random Gaussian world into a smooth RGB-D panorama trajectory."""
    import jax
    import jax.numpy as jnp

    from .synthetic import random_gaussians
    from ..ops.rasterizer_ref import render_dense

    h, w = image_shape
    key = jax.random.PRNGKey(seed)
    g = random_gaussians(
        key, n_gaussians, sh_degree=2, radius_range=(1.0, 8.0),
        scale_range=(0.05, 0.35),
    )
    # opaque-ish world so depth supervision is meaningful
    g["opacities"] = jnp.clip(g["opacities"] + 0.4, 0.0, 0.98)

    t = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    centers = np.stack(
        [0.6 * np.sin(t), 0.15 * np.sin(2 * t), 0.6 * np.cos(t)], axis=-1
    )
    rgbs, depths, poses = [], [], []

    def render_one(c2w):
        out = render_dense(
            g["means"], g["covariances"], g["harmonics"], g["opacities"],
            jnp.asarray(c2w), image_shape, camera_kind="erp", near=0.1,
            far=20.0, render_depth=True,
        )
        return out.color, out.depth, out.alpha

    render_one = jax.jit(render_one)
    for i in range(n_frames):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = centers[i]
        color, dacc, alpha = render_one(c2w)
        color = np.asarray(color)
        alpha = np.asarray(alpha)
        # expected depth -> normalize by alpha; background (alpha~0) = hole (0)
        dep = np.asarray(dacc) / np.maximum(alpha, 1e-6)
        dep = np.where(alpha > 0.5, dep, 0.0)
        rgbs.append((np.clip(color, 0, 1) * 255).astype(np.uint8))
        depths.append((np.clip(dep, 0, 60) * 1000).astype(np.uint16))
        poses.append(c2w)
    save_scene(root, split, scene, np.stack(rgbs), np.stack(depths),
               np.stack(poses))
    return {"n_frames": n_frames, "image_shape": image_shape}
