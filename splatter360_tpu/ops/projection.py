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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.transforms import inverse_se3
from ..geometry.sh import eval_sh


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray   # [N, 3] inverse 2D covariance (a, b, c): [[a, b], [b, c]]^-1
    depth: jnp.ndarray   # [N] sort key (camera z for pinhole, radial dist for erp)
    radius: jnp.ndarray  # [N, 2] per-axis extent in pixels (3 sigma marginals:
    #   rx = 3*sqrt(cov_xx), ry = 3*sqrt(cov_yy) — the exact x/y extents of the
    #   power > -4.5 cutoff ellipse, so per-axis boxes cull exactly what the
    #   compositors' power gate would anyway. ERP pole-stretching is horizontal,
    #   so ry stays small where rx blows up (anisotropic tiling footprints).
    valid: jnp.ndarray   # [N] bool
    # [N] optional elliptical-cull level for tile emission (ops/tiling.py):
    # the compositor gate region is {x: x^T Q x < gate_s} (power > -q with
    # gate_s = 2q, opacity-tightened like the radii). Emission computes the
    # EXACT min of the quadratic over each candidate tile rectangle; a tile
    # with min > gate_s gets zero contribution from every pixel, so skipping
    # it is output-identical — this kills the AABB's diagonal-corner tiles
    # that the per-axis radius box cannot.
    gate_s: Optional[jnp.ndarray] = None


def _to_cam(rot, t, means):
    """World->camera transform returning [N] component vectors (no [N,3] relayout)."""
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    x = rot[0, 0] * mx + rot[0, 1] * my + rot[0, 2] * mz + t[0]
    y = rot[1, 0] * mx + rot[1, 1] * my + rot[1, 2] * mz + t[1]
    z = rot[2, 0] * mx + rot[2, 1] * my + rot[2, 2] * mz + t[2]
    return x, y, z


def _rotate_rows(w2c_rot, du, dv):
    """Fold the (constant) world->cam rotation into two Jacobian rows given as
    [N]-scalar triples. Scalarized on purpose: tiny [N,2,3]/[N,3,3] einsums force
    Mosaic relayouts and run ~7x slower than plain VPU mul-adds at N~1M (measured
    on v5e, scripts/bench_projection.py)."""
    rows = []
    for d0, d1, d2 in (du, dv):
        rows.append(tuple(
            d0 * w2c_rot[0, k] + d1 * w2c_rot[1, k] + d2 * w2c_rot[2, k]
            for k in range(3)
        ))
    return rows


def _cov2d_scalar(w2c_rot, du, dv, covs):
    """2D covariance (a, b, c) from scalarized Jacobian rows and world covs.

    du/dv: triples of [N] arrays = d(pixel)/d(p_cam) rows; covs [N, 3, 3]
    or sym6 [N, 6] (the model path's layout-friendly form, see
    geometry/transforms.py cov_as_sym6). Computes T Σ Tᵀ with T = J @ R as
    pure elementwise [N] math.
    """
    (t00, t01, t02), (t10, t11, t12) = _rotate_rows(w2c_rot, du, dv)
    if covs.shape[-1] == 6 and covs.ndim == 2:
        cf = covs
        s00, s01, s02 = cf[:, 0], cf[:, 1], cf[:, 2]
        s11, s12, s22 = cf[:, 3], cf[:, 4], cf[:, 5]
    else:
        cf = covs.reshape(-1, 9)
        s00, s01, s02 = cf[:, 0], cf[:, 1], cf[:, 2]
        s11, s12, s22 = cf[:, 4], cf[:, 5], cf[:, 8]

    # Σ·tᵀ rows reused across the three quadratic forms.
    p0 = s00 * t00 + s01 * t01 + s02 * t02
    p1 = s01 * t00 + s11 * t01 + s12 * t02
    p2 = s02 * t00 + s12 * t01 + s22 * t02
    a = t00 * p0 + t01 * p1 + t02 * p2
    b = t10 * p0 + t11 * p1 + t12 * p2
    q0 = s00 * t10 + s01 * t11 + s02 * t12
    q1 = s01 * t10 + s11 * t11 + s12 * t12
    q2 = s02 * t10 + s12 * t11 + s22 * t12
    c = t10 * q0 + t11 * q1 + t12 * q2
    return a, b, c


def _finalize(u, v, a, b, c, depth, valid, eps2d=0.3, max_radius=None,
              opacities=None):
    """Pack scalarized projection results into a Projected tuple.

    max_radius: optional (max_rx, max_ry) caps in pixels.
    opacities: optional [N] — enables EXACT opacity-aware radius tightening.
      The compositors gate every contribution by alpha = o*exp(power) >= 1/255
      (ops/pallas/composite.py::_chunk_alpha, composite_jax, rasterizer_ref),
      so the true footprint is the {power >= -q} ellipse with
      q = min(4.5, log(255*o)), whose per-axis extents are sqrt(2*q*Sigma_xx/yy)
      — strictly inside the 3-sigma (q=4.5) box for o < e^4.5/255 ~ 0.353.
      Culling to the tightened box changes NO output pixel (the alpha gate
      already zeroes everything outside it) but shrinks instance emission,
      sort, and live-block counts. The CUDA reference always bins the 3-sigma
      box (SURVEY.md §2.9); this is a TPU-build improvement, not a departure.
    """
    mean2d = jnp.stack([u, v], axis=-1)
    a = a + eps2d
    c = c + eps2d
    det = a * c - b * b
    det_safe = jnp.where(det > 1e-12, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)
    # Per-axis marginals = exact x/y extents of the power=-q cutoff ellipse.
    if opacities is not None:
        o = jax.lax.stop_gradient(opacities)
        q = jnp.clip(jnp.log(255.0 * jnp.maximum(o, 1e-12)), 0.0, 4.5)
        scale = jnp.sqrt(q / 4.5)
        valid = valid & (o >= 1.0 / 255.0)
    else:
        scale = 1.0
    rx = jnp.ceil(3.0 * jnp.sqrt(a) * scale)
    ry = jnp.ceil(3.0 * jnp.sqrt(c) * scale)
    if max_radius is not None:
        rx = jnp.minimum(rx, max_radius[0])
        ry = jnp.minimum(ry, max_radius[1])
    radius = jnp.stack([rx, ry], axis=-1)
    valid = valid & (det > 1e-12)
    # Elliptical cull level: the gate region is {power > -q} = {x^T Q x <
    # 2q} with q = 4.5 (or the opacity-tightened q above). Exact regardless
    # of radius clamps (q is the true gate level, unlike a level recovered
    # from possibly-clamped radii). 1e-4 slack absorbs f32 rounding between
    # the emission-side rect-min and the compositor's per-pixel power.
    q_lvl = 4.5 * jnp.square(scale) if opacities is not None else 4.5
    gate_s = 2.0 * q_lvl * (1.0 + 1e-4) + 1e-6
    gate_s = jnp.broadcast_to(jnp.asarray(gate_s, u.dtype), u.shape)
    return Projected(mean2d, conic, depth, radius, valid, gate_s)


def project_pinhole(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    c2w: jnp.ndarray,
    intrinsics: jnp.ndarray,
    image_shape: tuple[int, int],
    near: jnp.ndarray | float,
    eps2d: float = 0.3,
    opacities: jnp.ndarray | None = None,
) -> Projected:
    """Project world-space Gaussians through a normalized-intrinsics pinhole camera.

    means [N, 3], covs [N, 3, 3], c2w [4, 4], intrinsics [3, 3] normalized.
    opacities: optional [N], see _finalize (opacity-aware radius tightening).
    """
    h, w = image_shape
    w2c = inverse_se3(c2w)
    rot = w2c[:3, :3]
    x, y, z = _to_cam(rot, w2c[:3, 3], means)

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

    zero = jnp.zeros_like(z_safe)
    du = (fx / z_safe, zero, -fx * tx / z_safe)
    dv = (zero, fy / z_safe, -fy * ty / z_safe)
    a, b, c = _cov2d_scalar(rot, du, dv, covs)
    mr = float(max(h, w))
    return _finalize(u, v, a, b, c, z, valid, eps2d, max_radius=(mr, mr),
                     opacities=opacities)


def project_ortho(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    c2w: jnp.ndarray,
    extent: float | jnp.ndarray,
    image_shape: tuple[int, int],
    near: jnp.ndarray | float = 0.0,
    far: jnp.ndarray | float = jnp.inf,
    eps2d: float = 0.3,
) -> Projected:
    """Orthographic projection (paper-figure rendering parity).

    Mirrors the reference's figures-only orthographic rasterizer path
    (/root/reference/src/model/decoder/cuda_splatting.py:129-221, used by
    src/paper/* point-cloud/teaser generation): camera looks down +z, the
    world-space square of side `extent` centered on the camera axis maps to
    the full image. Jacobian is constant (fx, fy on the diagonal), so the 2D
    covariance is an exact (not local-affine) projection.
    """
    h, w = image_shape
    w2c = inverse_se3(c2w)
    rot = w2c[:3, :3]
    x, y, z = _to_cam(rot, w2c[:3, 3], means)

    extent = jnp.asarray(extent, dtype=means.dtype)
    fx = w / extent
    fy = h / extent
    u = fx * x + 0.5 * w - 0.5
    v = fy * y + 0.5 * h - 0.5
    valid = (z > near) & (z < far)

    zero = jnp.zeros_like(x)
    du = (fx * jnp.ones_like(x), zero, zero)
    dv = (zero, fy * jnp.ones_like(x), zero)
    a, b, c = _cov2d_scalar(rot, du, dv, covs)
    mr = float(max(h, w))
    return _finalize(u, v, a, b, c, z, valid, eps2d, max_radius=(mr, mr))


def project_erp(
    means: jnp.ndarray,
    covs: jnp.ndarray,
    c2w: jnp.ndarray,
    image_shape: tuple[int, int],
    near: jnp.ndarray | float,
    eps2d: float = 0.3,
    opacities: jnp.ndarray | None = None,
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
    x, y, z = _to_cam(rot, w2c[:3, 3], means)

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

    # du/dp = -W/(2pi) * dtheta/dp; dtheta/dp = (z/rho2, 0, -x/rho2)
    ku = -w / (2 * math.pi)
    kv = -h / math.pi
    du = (ku * z / rho2_safe, jnp.zeros_like(x), -ku * x / rho2_safe)
    # dphi/dp = (-x y / (r2 rho), rho / r2, -z y / (r2 rho))
    dv = (
        -kv * x * y / (r2_safe * rho_safe),
        kv * rho_safe / r2_safe,
        -kv * z * y / (r2_safe * rho_safe),
    )
    a, b, c = _cov2d_scalar(rot, du, dv, covs)
    from .tiling import TILE_W  # late import (tiling imports Projected from here)

    # Radius caps: (a) half the image height bounds pole blow-up; (b) W/2-TILE_W/2-1
    # keeps a splat's footprint within half the azimuth range minus a tile width,
    # which lets the tiled compositor evaluate the seam-wrapped quadratic exactly
    # with a single per-tile re-centering shift (ops/pallas/composite.py). Applied
    # identically in every backend so dense/jax/pallas stay bit-comparable.
    max_rx = float(min(h // 2, max(w // 2 - TILE_W // 2 - 1, 8)))
    max_ry = float(h // 2)
    return _finalize(u, v, a, b, c, r, valid, eps2d, max_radius=(max_rx, max_ry),
                     opacities=opacities)


def sh_colors(
    sh: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray, degree: int
) -> jnp.ndarray:
    """3DGS color model: clamp(eval_sh(dir) + 0.5, 0). sh [N, 3, n] -> [N, 3]."""
    d = means - campos
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return jnp.maximum(eval_sh(sh, d, degree) + 0.5, 0.0)
