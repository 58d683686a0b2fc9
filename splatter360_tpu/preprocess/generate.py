"""Offline RGB-D panorama dataset generation over procedural worlds.

Pipeline parity with the reference's Habitat generator (SURVEY.md §3.4;
/root/reference/preprocess/dataset_generation/dataset_generation_different_content_mp.py):
per frame it renders the panorama, converts z-depth to ray distance, applies the
zero-ratio frame filter (:147-158 — trajectories seeing too much void are
rejected), and writes scenes in the training data contract (scene_io.save_scene:
ERP RGB u8 + ERP depth mm u16 + c2w poses, sharded).

Two render paths:
  * direct ERP (default, TPU-first): one equirect render per frame — the
    capability the reference lacks (its Habitat rig is pinhole-only);
  * via_cubes=True (reference parity): render the 6-face cube rig with the
    pinhole camera, z-depth → distance (zdepth_to_distance), stitch RGB and
    distance to ERP with cube_to_erp — the exact stitch_cubemap dataflow. Used
    by tests to cross-check the stitching path against direct ERP rendering.
"""

from __future__ import annotations

import numpy as np

from .scene_builder import build_room_world
from .trajectory import sample_trajectory


def _render_frames(world, poses, image_shape, via_cubes, far):
    import jax
    import jax.numpy as jnp

    from ..geometry.cubemap import (
        cube_face_extrinsics, cube_face_intrinsics, cube_to_erp,
        zdepth_to_distance,
    )
    from ..ops.rasterizer_ref import render_dense

    h, w = image_shape
    g = {
        "means": jnp.asarray(world.means),
        "covariances": jnp.asarray(world.covariances),
        "harmonics": jnp.asarray(world.harmonics),
        "opacities": jnp.asarray(world.opacities),
    }

    if not via_cubes:
        @jax.jit
        def one(c2w):
            out = render_dense(
                g["means"], g["covariances"], g["harmonics"], g["opacities"],
                c2w, image_shape, camera_kind="erp", near=0.05, far=far,
                render_depth=True,
            )
            return out.color, out.depth, out.alpha
    else:
        fw = h // 2
        intr = cube_face_intrinsics()

        @jax.jit
        def one(c2w):
            faces_c2w = cube_face_extrinsics(c2w)  # [6, 4, 4]

            def face(fc2w):
                out = render_dense(
                    g["means"], g["covariances"], g["harmonics"],
                    g["opacities"], fc2w, (fw, fw), camera_kind="pinhole",
                    intrinsics=intr, near=0.05, far=far, render_depth=True,
                )
                return out.color, out.depth, out.alpha

            col, zd, al = jax.vmap(face)(faces_c2w)
            # expected z-depth -> ray distance per face, then stitch to ERP
            dist = zdepth_to_distance(
                zd / jnp.maximum(al, 1e-6), 0.5, 0.5, 0.5, 0.5
            ) * al
            color = cube_to_erp(col, h, w)
            depth = cube_to_erp(dist[..., None], h, w)[..., 0]
            alpha = cube_to_erp(al[..., None], h, w)[..., 0]
            return color, depth, alpha

    frames = []
    for i in range(poses.shape[0]):
        color, dacc, alpha = one(jnp.asarray(poses[i]))
        frames.append(
            (np.asarray(color), np.asarray(dacc), np.asarray(alpha))
        )
    return frames


def generate_scene(
    root,
    split: str = "train",
    scene: str = "proc000",
    n_frames: int = 32,
    image_shape: tuple[int, int] = (128, 256),
    seed: int = 0,
    spacing: float = 0.09,
    via_cubes: bool = False,
    max_zero_ratio: float = 0.03,
    far: float = 30.0,
    max_retries: int = 3,
    sh_degree: int = 2,
    n_panels: int = 0,
    scale_jitter: float = 1.0,
):
    """Build a world, sample a trajectory, render, filter, write one scene.

    Returns an info dict (frame count, rejection count, world size).
    """
    from ..data.scene_io import save_scene

    rejections = 0
    for attempt in range(max_retries):
        s = seed + 1000 * attempt
        world = build_room_world(seed=s, spacing=spacing, sh_degree=sh_degree,
                                 n_panels=n_panels, scale_jitter=scale_jitter)
        poses = sample_trajectory(world, n_frames, seed=s)
        frames = _render_frames(world, poses, image_shape, via_cubes, far)
        zero_ratios = [float((a < 0.5).mean()) for _, _, a in frames]
        if max(zero_ratios) <= max_zero_ratio:
            break
        rejections += 1
    else:
        raise RuntimeError(
            f"scene {scene}: all {max_retries} trajectories failed the "
            f"zero-ratio filter (worst {max(zero_ratios):.3f})"
        )

    rgbs, depths = [], []
    for color, dacc, alpha in frames:
        dep = dacc / np.maximum(alpha, 1e-6)
        dep = np.where(alpha > 0.5, dep, 0.0)  # holes stored as 0 (mm contract)
        rgbs.append((np.clip(color, 0, 1) * 255).astype(np.uint8))
        depths.append((np.clip(dep, 0, 60) * 1000).astype(np.uint16))
    save_scene(root, split, scene, np.stack(rgbs), np.stack(depths), poses)
    return {
        "scene": scene,
        "n_frames": n_frames,
        "image_shape": tuple(image_shape),
        "n_gaussians": int(world.means.shape[0]),
        "rejections": rejections,
        "via_cubes": via_cubes,
    }
