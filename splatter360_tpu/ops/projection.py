"""3D Gaussian -> 2D screen-space projection for pinhole and equirect cameras.

Pure-JAX, autograd-differentiable. Shared by the dense reference renderer (oracle) and
the tiled production path (where only the compositing loop is a Pallas kernel).

Parity notes vs the reference's CUDA rasterizer (diff-gaussian-rasterization-modified,
called from /root/reference/src/model/decoder/cuda_splatting.py:99-124):
  * Pinhole projection uses the EWA local-affine approximation with the same 0.3-pixel
    low-pass dilation and 1.3x tan-FoV frustum clamp as 3DGS.
  * The equirect camera model is NEW capability (the reference renders 6 pinhole cube
    faces and stitches because its CUDA rasterizer is pinhole-only; BASELINE.json asks
    for direct equirectangular projection). Depth ordering for ERP uses radial distance.
  * Colors: SH evaluated along (mean - campos), +0.5 offset, clamped >= 0 (3DGS).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..geometry.transforms import inverse_se3
from ..geometry.sh import eval_sh


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray   # [N, 3] inverse 2D covariance (a, b, c): [[a, b], [b, c]]^-1
    depth: jnp.ndarray   # [N] sort key (camera z for pinhole, radial dist for erp)
    radius: jnp.ndarray  # [N] max extent in pixels (3 sigma)
    valid: jnp.ndarray   # [N] bool


def _cov2d_from_jacobian(j, w2c_rot, covs):
    """j: [N, 2, 3] d(pixel)/d(p_cam); covs: [N, 3, 3] world. Returns [N, 2, 2]."""
    t = jnp.einsum("nij,jk->nik", j, w2c_rot)  # [N, 2, 3] d(pixel)/d(p_world)
    return jnp.einsum("nij,njk,nlk->nil", t, covs, t)


def _finalize(mean2d, cov2d, depth, valid, eps2d=0.3, max_radius=None):
    cov2d = cov2d + eps2d * jnp.eye(2, dtype=cov2d.dtype)
    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det > 1e-12, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    if max_radius is not None:
        radius = jnp.minimum(radius, max_radius)
    valid = valid & (det > 1e-12)
    return Projected(mean2d, conic, depth, radius, valid)


def project_pinhole(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    c2w: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple[int, int],
    near: jnp.ndarray | float,
    eps2d: float = 0.3,
) -> Projected:
    """Project world-space Gaussians through a normalized-intrinsics pinhole camera.

    means [N, 3], covs [N, 3, 3], c2w [4, 4], intrinsics [3, 3] normalized.
    """
    h, w = image_shape
    w2c = inverse_se3(c2w)
    rot = w2c[:3, :3]
    p = jnp.einsum("ij,nj->ni", rot, means) + w2c[:3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]

    fx = intrinsics[0, 0] * w
    fy = intrinsics[1, 1] * h
    cx = intrinsics[0, 2] * w
    cy = intrinsics[1, 2] * h

    near = jnp.asarray(near, dtype=means.dtype)
    valid = z > 0.2 * near  # matches the CUDA 0.2 threshold under the 1/near rescale
    z_safe = jnp.where(valid, z, 1.0)

    # EWA frustum clamp: limit x/z, y/z to 1.3 * tan(fov/2) before the Jacobian.
    tan_x = 0.5 * w / fx
    tan_y = 0.5 * h / fy
    tx = jnp.clip(x / z_safe, -1.3 * tan_x, 1.3 * tan_x)
    ty = jnp.clip(y / z_safe, -1.3 * tan_y, 1.3 * tan_y)

    u = fx * x / z_safe + cx - 0.5
    v = fy * y / z_safe + cy - 0.5
    mean2d = jnp.stack([u, v], axis=-1)

    zero = jnp.zeros_like(z_safe)
    j = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * tx / z_safe], axis=-1),
            jnp.stack([zero, fy / z_safe, -fy * ty / z_safe], axis=-1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    cov2d = _cov2d_from_jacobian(j, rot, covs)
    return _finalize(mean2d, cov2d, z, valid, eps2d, max_radius=float(max(h, w)))


def project_erp(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    c2w: jnp.ndarray,
    image_shape: tuple[int, int],
    near: jnp.ndarray | float,
    eps2d: float = 0.3,
) -> Projected:
    """Project world-space Gaussians directly into an equirectangular image.

    Pixel mapping follows geometry.erp (hm3d/replica convention):
      u = (-theta/2pi + 0.5) * W - 0.5, theta = atan2(x, z)
      v = (-phi/pi + 0.5) * H - 0.5,    phi  = atan2(y, rho), rho = sqrt(x^2 + z^2)
    The 2D covariance uses the local-affine (EWA-style) Jacobian of that mapping; the
    pole singularity (1/rho) is handled by clamping the per-Gaussian pixel radius.
    """
    h, w = image_shape
    w2c = inverse_se3(c2w)
    rot = w2c[:3, :3]
    p = jnp.einsum("ij,nj->ni", rot, means) + w2c[:3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]

    rho2 = x * x + z * z
    r2 = rho2 + y * y
    r = jnp.sqrt(r2)
    rho = jnp.sqrt(rho2)
    near = jnp.asarray(near, dtype=means.dtype)
    valid = r > 0.2 * near
    rho2_safe = jnp.maximum(rho2, 1e-12)
    rho_safe = jnp.maximum(rho, 1e-6)
    r2_safe = jnp.maximum(r2, 1e-12)

    theta = jnp.arctan2(x, z)
    phi = jnp.arctan2(y, rho_safe)
    u = (-theta / (2 * math.pi) + 0.5) * w - 0.5
    v = (-phi / math.pi + 0.5) * h - 0.5
    mean2d = jnp.stack([u, v], axis=-1)

    # du/dp = -W/(2pi) * dtheta/dp; dtheta/dp = (z/rho2, 0, -x/rho2)
    ku = -w / (2 * math.pi)
    kv = -h / math.pi
    du = jnp.stack(
        [ku * z / rho2_safe, jnp.zeros_like(x), -ku * x / rho2_safe], axis=-1
    )
    # dphi/dp = (-x y / (r2 rho), rho / r2, -z y / (r2 rho))
    dv = jnp.stack(
        [
            -kv * x * y / (r2_safe * rho_safe),
            kv * rho_safe / r2_safe,
            -kv * z * y / (r2_safe * rho_safe),
        ],
        axis=-1,
    )
    j = jnp.stack([du, dv], axis=-2)  # [N, 2, 3]
    cov2d = _cov2d_from_jacobian(j, rot, covs)
    # Radius cap: (a) half the image height bounds pole blow-up; (b) W/2 - 65 keeps a
    # splat's footprint within half the azimuth range minus a tile width, which lets
    # the tiled compositor evaluate the seam-wrapped quadratic exactly with a single
    # per-tile re-centering shift (ops/pallas/composite.py). Applied identically in
    # every backend so dense/jax/pallas stay bit-comparable.
    max_radius = float(min(h // 2, max(w // 2 - 65, 8)))
    return _finalize(mean2d, cov2d, r, valid, eps2d, max_radius=max_radius)


def sh_colors(
    sh: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray, degree: int
) -> jnp.ndarray:
    """3DGS color model: clamp(eval_sh(dir) + 0.5, 0). sh [N, 3, n] -> [N, 3]."""
    d = means - campos
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return jnp.maximum(eval_sh(sh, d, degree) + 0.5, 0.0)
