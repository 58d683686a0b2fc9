"""Cubemap face rigs + on-device ERP<->cubemap resampling.

Re-designs the reference's two CPU/GPU resamplers as precomputed-grid device gathers:
  * Equirec2Cube (/root/reference/src/geometry/util.py:7-101; scipy, dataloader-side CPU)
  * Cube2Equirec (/root/reference/src/geometry/layers.py:41-116; 3D grid_sample)
Both become single bilinear gathers inside jit. All directions use the hm3d/replica ERP
camera convention of geometry.erp (y up, z forward at the image center, x "left").

Canonical face order: [F R B L U D] (the reference's supervision/e2c order; the raw
habitat storage order [U B L F R D] is handled in the data layer, mirroring
dataset_hm3d.py:203-213 and model_wrapper_erp.py:135-158 change_order).

Face cameras are OpenCV-convention pinholes (x right, y down, z forward), 90 deg FoV,
normalized intrinsics fx = fy = cx = cy = 0.5 (dataset contract: normalized cube
intrinsics ~0.5, dataset_hm3d.py:337-355). The face-to-ERP rotations below are proper
rotations derived so that a pinhole render of each face matches erp_to_cube of the ERP
render (validated by tests/test_cubemap.py round-trip tests).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..ops.resample import bilinear_sample, bilinear_sample_3d_faces

CUBE_FACE_ORDER_FRBLUD = ("F", "R", "B", "L", "U", "D")

# Rotation face-camera -> ERP-camera per face, columns = (image-x axis, image-y axis,
# forward axis) expressed in the ERP camera frame. Derived from the unit-cube face
# parameterization (util.py:26-57) translated into the utils360 ERP convention.
_FACE_ROTATIONS = np.array(
    [
        # F: fwd +z, img-x -> -x (scene right), img-y -> -y (down)
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
        # R: fwd -x, img-x -> -z, img-y -> -y
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
        # B: fwd -z, img-x -> +x, img-y -> -y
        [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
        # L: fwd +x, img-x -> +z, img-y -> -y
        [[0, 0, 1], [0, -1, 0], [1, 0, 0]],
        # U: fwd +y, img-x -> -x, img-y -> +z
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
        # D: fwd -y, img-x -> -x, img-y -> -z
        [[-1, 0, 0], [0, 0, -1], [0, -1, 0]],
    ],
    dtype=np.float64,
).transpose(0, 2, 1)  # stack rows were axis vectors; transpose to put them in columns.


def cube_face_rotations(dtype=jnp.float32) -> jnp.ndarray:
    """[6, 3, 3] rotation (face camera -> ERP camera) in F R B L U D order."""
    return jnp.asarray(_FACE_ROTATIONS, dtype=dtype)


def cube_face_extrinsics(c2w_erp: jnp.ndarray) -> jnp.ndarray:
    """ERP camera-to-world pose [..., 4, 4] -> per-face c2w poses [..., 6, 4, 4]."""
    rots = cube_face_rotations(c2w_erp.dtype)  # [6, 3, 3]
    face_rot = jnp.einsum("...ij,fjk->...fik", c2w_erp[..., :3, :3], rots)
    t = jnp.broadcast_to(
        c2w_erp[..., None, :3, 3], (*face_rot.shape[:-2], 3)
    )
    top = jnp.concatenate([face_rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], dtype=c2w_erp.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def cube_face_intrinsics(dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 90-deg-FoV pinhole intrinsics shared by all faces: [3, 3]."""
    return jnp.asarray(
        [[0.5, 0.0, 0.5], [0.0, 0.5, 0.5], [0.0, 0.0, 1.0]], dtype=dtype
    )


def _face_dirs(face_w: int) -> np.ndarray:
    """Unit ray directions (ERP camera frame) for every pixel of the 6 faces.

    Returns [6, face_w, face_w, 3]. Pixel-center convention: u_n = (u+0.5)/W - 0.5,
    tan(half-fov at edge) = 1 (exact 90 deg FoV).
    """
    u = (np.arange(face_w, dtype=np.float64) + 0.5) / face_w - 0.5
    uu, vv = np.meshgrid(u, u, indexing="xy")
    # OpenCV face-camera direction: ((u - cx)/fx, (v - cy)/fy, 1) with fx = fy = 0.5.
    d_cam = np.stack([uu / 0.5, vv / 0.5, np.ones_like(uu)], axis=-1)
    dirs = np.einsum("fij,hwj->fhwi", _FACE_ROTATIONS, d_cam)
    return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)


@functools.lru_cache(maxsize=16)
def erp_to_cube_grid(equ_h: int, equ_w: int, face_w: int):
    """Precompute ERP pixel coords sampled by each cubemap face pixel.

    Returns (coords [6, face_w, face_w, 2] float32 ERP pixel coords,
             cos_factor [6, face_w, face_w] float32 distance->z-depth factor,
    mirroring Equirec2Cube.cosmaps, util.py:22-24).
    """
    dirs = _face_dirs(face_w)  # [6, fw, fw, 3]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = np.arctan2(x, z)
    phi = np.arctan2(y, np.sqrt(x * x + z * z))
    px = (-theta / (2 * np.pi) + 0.5) * equ_w - 0.5
    py = (-phi / np.pi + 0.5) * equ_h - 0.5
    coords = np.stack([px, py], axis=-1).astype(np.float32)
    # z-depth = distance * cos(angle to face normal); the forward component of the
    # unit direction in the face camera frame IS that cosine.
    fwd = _FACE_ROTATIONS[:, :, 2]  # [6, 3]
    cos_factor = np.einsum("fhwi,fi->fhw", dirs, fwd).astype(np.float32)
    return coords, cos_factor


@functools.lru_cache(maxsize=16)
def cube_to_erp_grid(face_w: int, equ_h: int, equ_w: int):
    """Precompute, per ERP pixel, the (face index, face pixel coords) to gather.

    Returns (face_idx [equ_h, equ_w] int32, coords [equ_h, equ_w, 2] float32).
    Face selection is by largest |axis component| (cube projection), so grids cover the
    sphere exactly with no seams; replaces Cube2Equirec's facetype/faceuv tables
    (layers.py:60-106).
    """
    xg = np.arange(equ_w, dtype=np.float64)
    yg = np.arange(equ_h, dtype=np.float64)
    xx, yy = np.meshgrid(xg, yg, indexing="xy")
    theta = (0.5 - (xx + 0.5) / equ_w) * 2 * np.pi
    phi = -((yy + 0.5) / equ_h - 0.5) * np.pi
    d = np.stack(
        [np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)],
        axis=-1,
    )  # [H, W, 3] ERP-frame unit dirs
    # Project into each face camera: d_cam = R_f^T d.
    d_cam = np.einsum("fji,hwj->fhwi", _FACE_ROTATIONS, d)  # [6, H, W, 3]
    zf = d_cam[..., 2]
    # Valid cube projection: forward component positive and dominates |x|, |y|.
    score = np.where(
        zf > 0,
        zf / np.maximum(np.maximum(np.abs(d_cam[..., 0]), np.abs(d_cam[..., 1])), 1e-12),
        -np.inf,
    )
    face_idx = np.argmax(score, axis=0)  # [H, W]
    sel = np.take_along_axis(
        d_cam, face_idx[None, :, :, None].repeat(3, axis=-1), axis=0
    )[0]
    u = sel[..., 0] / sel[..., 2]  # in [-1, 1]
    v = sel[..., 1] / sel[..., 2]
    px = (u * 0.5 + 0.5) * face_w - 0.5
    py = (v * 0.5 + 0.5) * face_w - 0.5
    coords = np.stack([px, py], axis=-1).astype(np.float32)
    return face_idx.astype(np.int32), coords


def erp_to_cube(
    erp: jnp.ndarray, face_w: int, depth_to_z: bool = False
) -> jnp.ndarray:
    """Resample an ERP image [H, W, C] into cubemap faces [6, face_w, face_w, C].

    depth_to_z: multiply by the cos factor converting ray distance into pinhole z-depth
    (Equirec2Cube.run's cosmaps path for depth maps).
    """
    h, w = erp.shape[0], erp.shape[1]
    coords, cos_factor = erp_to_cube_grid(h, w, face_w)
    out = bilinear_sample(erp, jnp.asarray(coords), wrap_x=True)
    if depth_to_z:
        out = out * jnp.asarray(cos_factor)[..., None]
    return out


def cube_to_erp(faces: jnp.ndarray, equ_h: int, equ_w: int) -> jnp.ndarray:
    """Resample cubemap faces [6, fw, fw, C] into an ERP image [equ_h, equ_w, C].

    Differentiable w.r.t. faces (used for fusing cube-branch features into the ERP
    branch, encoder_costvolume.py:300-312, and for stitching rendered faces)."""
    fw = faces.shape[1]
    face_idx, coords = cube_to_erp_grid(fw, equ_h, equ_w)
    return bilinear_sample_3d_faces(faces, jnp.asarray(face_idx), jnp.asarray(coords))


def erp_distance_to_cube_zdepth_factor(face_w: int) -> jnp.ndarray:
    """[6, face_w, face_w] multiplicative factor: ray distance -> face z-depth."""
    _, cos_factor = erp_to_cube_grid(4 * face_w, 2 * face_w, face_w)
    return jnp.asarray(cos_factor)


def zdepth_to_distance(zdepth: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pinhole z-depth map -> euclidean ray-distance map.

    distance = z * |((u - cx)/fx, (v - cy)/fy, 1)| with u, v NORMALIZED pixel
    centers ((col + 0.5)/W, (row + 0.5)/H) and normalized intrinsics (the cube
    rig uses fx = fy = 0.5, cx = cy = 0.5). Reference parity:
    src/geometry/z_depth_to_distance.py:4-34 (`depth_to_distance_map_batch`) —
    with its latent `torch.meshgrid` ij/xy transpose FIXED here (the bug cancels
    in the reference only because fx == fy and the principal point is centered;
    this implementation indexes u along width and v along height explicitly).

    zdepth: [..., h, w]; intrinsics are scalars (python/np/jnp).
    """
    h, w = zdepth.shape[-2], zdepth.shape[-1]
    u = (jnp.arange(w, dtype=zdepth.dtype) + 0.5) / w  # along width
    v = (jnp.arange(h, dtype=zdepth.dtype) + 0.5) / h  # along height
    xn = (u[None, :] - cx) / fx  # [1, w]
    yn = (v[:, None] - cy) / fy  # [h, 1]
    norm = jnp.sqrt(1.0 + xn * xn + yn * yn)  # [h, w]
    return zdepth * norm
