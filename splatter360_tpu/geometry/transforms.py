"""Rigid transforms, quaternions, Gaussian covariance building, pose interpolation.

Behavioral parity notes:
  * quaternion_to_matrix / build_covariance mirror the xyzw-quaternion covariance math of
    /root/reference/src/model/encoder/common/gaussians.py:8-44 (Sigma = R S S^T R^T).
  * interpolate_pose_6d mirrors the 6D-rotation pose interpolation used for trajectory
    videos (/root/reference/src/model/model_wrapper_erp.py:891-979).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quat_xyzw: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """xyzw quaternion [..., 4] -> rotation matrix [..., 3, 3] (scipy component order)."""
    i = quat_xyzw[..., 0]
    j = quat_xyzw[..., 1]
    k = quat_xyzw[..., 2]
    r = quat_xyzw[..., 3]
    two_s = 2.0 / (jnp.sum(quat_xyzw * quat_xyzw, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def build_covariance(scale: jnp.ndarray, quat_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian world covariance: Sigma = R diag(s)^2 R^T.

    scale: [..., 3]; quat_xyzw: [..., 4] -> [..., 3, 3].
    """
    rot = quaternion_to_matrix(quat_xyzw)
    rs = rot * scale[..., None, :]  # R @ diag(s)
    return rs @ jnp.swapaxes(rs, -1, -2)


# Symmetric-6 covariance representation (s00, s01, s02, s11, s12, s22).
#
# WHY: a per-gaussian [N, 3, 3] tensor kept live across the train step's
# fwd/bwd boundary gets a TPU tiled layout that pads (3, 3) -> (4, 128) — a
# 57x HBM expansion (measured: the 36 MB covariance residual cost 2 GB at the
# 512x1024 hm3d scale and OOMed the chip). The projection math only ever reads
# the 6 unique entries as [N] columns (_cov2d_scalar), so the model path
# carries sym6 and the [3, 3] form is accepted everywhere for interchange.
_SYM6_IDX = (0, 1, 2, 4, 5, 8)  # row-major upper-triangle picks from [..., 9]


def cov_as_sym6(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] or [..., 6] covariance -> [..., 6] (s00,s01,s02,s11,s12,s22)."""
    if cov.shape[-1] == 6 and (cov.ndim < 2 or cov.shape[-2:] != (3, 3)):
        return cov
    flat = cov.reshape(*cov.shape[:-2], 9)
    return flat[..., jnp.array(_SYM6_IDX)]


def sym6_to_matrix(sym6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> full symmetric [..., 3, 3]."""
    s00, s01, s02, s11, s12, s22 = (sym6[..., i] for i in range(6))
    rows = jnp.stack(
        [s00, s01, s02, s01, s11, s12, s02, s12, s22], axis=-1
    )
    return rows.reshape(*sym6.shape[:-1], 3, 3)


def build_covariance_sym6(
    scale: jnp.ndarray,
    quat_xyzw: jnp.ndarray,
    world_rot: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Fully scalarized Sigma = (Rw Rq S)(Rw Rq S)^T as a sym6 [..., 6].

    scale [..., 3]; quat_xyzw [..., 4]; world_rot [..., 3, 3] or None — an
    extra rotation folded in BEFORE the product (the adapter's c2w rotation,
    broadcast over the gaussian axis). No [..., 3, 3] per-gaussian tensor is
    ever materialized: everything is elementwise [...] math that XLA fuses.
    """
    i = quat_xyzw[..., 0]
    j = quat_xyzw[..., 1]
    k = quat_xyzw[..., 2]
    r = quat_xyzw[..., 3]
    two_s = 2.0 / (jnp.sum(quat_xyzw * quat_xyzw, axis=-1) + eps)
    rq = (
        1 - two_s * (j * j + k * k),
        two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r),
        1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r),
        two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j),
    )  # 9 x [...] entries of R_quat, row-major
    if world_rot is not None:
        # rw[a][b] = sum_c world_rot[..., a, c] * rq[c*3+b]; world_rot entries
        # broadcast against the gaussian axis (they carry no N dimension)
        wr = [[world_rot[..., a, b] for b in range(3)] for a in range(3)]
        m = [
            sum(wr[a][c] * rq[c * 3 + b] for c in range(3))
            for a in range(3)
            for b in range(3)
        ]
    else:
        m = list(rq)
    s0, s1, s2 = scale[..., 0], scale[..., 1], scale[..., 2]
    # M = R diag(s): scale the columns
    m = [m[3 * a + b] * (s0, s1, s2)[b] for a in range(3) for b in range(3)]

    def dot(a, b):
        return (
            m[3 * a] * m[3 * b] + m[3 * a + 1] * m[3 * b + 1]
            + m[3 * a + 2] * m[3 * b + 2]
        )

    return jnp.stack(
        [dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)],
        axis=-1,
    )


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 4] with a trailing 1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def transform_points(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a [..., 4, 4] rigid transform to [..., 3] points (broadcasting)."""
    return (
        jnp.einsum("...ij,...j->...i", matrix[..., :3, :3], points)
        + matrix[..., :3, 3]
    )


def inverse_se3(pose: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a [..., 4, 4] SE(3) pose (no general matrix inverse)."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_t, t)
    top = jnp.concatenate([rot_t, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_6d_to_matrix(d6: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Gram-Schmidt 6D rotation representation [..., 6] -> [..., 3, 3]."""
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + eps)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> first two rows flattened [..., 6]."""
    return jnp.concatenate([rot[..., 0, :], rot[..., 1, :]], axis=-1)


def interpolate_pose_6d(pose_a: jnp.ndarray, pose_b: jnp.ndarray, t) -> jnp.ndarray:
    """Interpolate two c2w poses: lerp translation + 6D-rotation lerp + re-orthogonalize.

    t may be a scalar or an array broadcastable to [..., 1]; matches the reference's
    interpolate_render_poses_m9d trajectory generator behavior.
    """
    t = jnp.asarray(t, dtype=pose_a.dtype)
    while t.ndim < pose_a.ndim - 2:
        t = t[..., None]
    trans = (1 - t)[..., None] * pose_a[..., :3, 3] + t[..., None] * pose_b[..., :3, 3]
    d6 = (1 - t)[..., None] * matrix_to_rotation_6d(pose_a[..., :3, :3]) + t[
        ..., None
    ] * matrix_to_rotation_6d(pose_b[..., :3, :3])
    rot = rotation_6d_to_matrix(d6)
    top = jnp.concatenate([rot, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose_a.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def trajectory_wobble(pose: jnp.ndarray, radius, t) -> jnp.ndarray:
    """Camera-space circular wobble around a base c2w pose (reference
    src/visualization/camera_trajectory/wobble.py generate_wobble): the camera
    origin traces a circle of `radius` in its local xy plane; orientation fixed.
    t in [0, 1] (one full loop)."""
    t = jnp.asarray(t, pose.dtype)
    dx = radius * jnp.sin(2.0 * jnp.pi * t)
    dy = -radius * jnp.cos(2.0 * jnp.pi * t) + radius
    delta = jnp.stack([dx, dy, jnp.zeros_like(dx)], axis=-1)  # [..., 3]
    world_delta = jnp.einsum("ij,...j->...i", pose[:3, :3], delta)
    out = jnp.broadcast_to(pose, (*world_delta.shape[:-1], 4, 4))
    return out.at[..., :3, 3].add(world_delta)


def trajectory_spin(pose: jnp.ndarray, t) -> jnp.ndarray:
    """Yaw spin in place: rotate the camera about its local up (y) axis by
    2*pi*t (reference render_video_generic spin trajectory)."""
    t = jnp.asarray(t, pose.dtype)
    ang = 2.0 * jnp.pi * t
    c, s = jnp.cos(ang), jnp.sin(ang)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rot_y = jnp.stack(
        [jnp.stack([c, z, s], axis=-1),
         jnp.stack([z, o, z], axis=-1),
         jnp.stack([-s, z, c], axis=-1)],
        axis=-2,
    )  # [..., 3, 3]
    new_rot = jnp.einsum("ij,...jk->...ik", pose[:3, :3], rot_y)
    out = jnp.broadcast_to(pose, (*new_rot.shape[:-2], 4, 4))
    return out.at[..., :3, :3].set(new_rot)
