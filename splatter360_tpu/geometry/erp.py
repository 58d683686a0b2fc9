"""Equirectangular (ERP) <-> spherical <-> cartesian coordinate transforms.

Implements the hm3d/replica convention of the reference (behavioral parity with
/root/reference/src/geometry/utils360.py:93-104,148-153,193-198,250-263 and
sphere_projection.py:6-86), as stateless, jit-friendly JAX functions:

  pixel (x, y)    ->  theta = (0.5 - (x + 0.5)/W) * 2*pi   (azimuth; +z at image center)
                      phi   = -((y + 0.5)/H - 0.5) * pi    (elevation; +pi/2 at top row)
  spherical       ->  x = r cos(phi) sin(theta)
                      y = r sin(phi)
                      z = r cos(phi) cos(theta)
  cartesian       ->  theta = atan2(x, z); phi = atan2(y, sqrt(x^2+z^2)); r = |p|
  spherical       ->  pixel x = (-theta/(2*pi) + 0.5) * W - 0.5
                      pixel y = (-phi/pi + 0.5) * H - 0.5

All functions are shape-polymorphic over leading dims and operate on the trailing axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def erp_pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer pixel-center coordinates of an ERP image. Returns [H, W, 2] (x, y)."""
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)


def erp_to_spherical(xy: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """ERP pixel coords [..., 2] -> (theta, phi) [..., 2]."""
    x = xy[..., 0]
    y = xy[..., 1]
    theta = (0.5 - (x + 0.5) / width) * TWO_PI
    phi = -((y + 0.5) / height - 0.5) * math.pi
    return jnp.stack([theta, phi], axis=-1)


def spherical_to_cartesian(tp: jnp.ndarray, radius=None) -> jnp.ndarray:
    """(theta, phi[, r]) [..., 2|3] -> xyz [..., 3]."""
    theta = tp[..., 0]
    phi = tp[..., 1]
    if radius is None:
        r = tp[..., 2] if tp.shape[-1] >= 3 else jnp.ones_like(theta)
    else:
        r = jnp.asarray(radius, dtype=tp.dtype) * jnp.ones_like(theta)
    cos_phi = jnp.cos(phi)
    x = cos_phi * jnp.sin(theta) * r
    y = jnp.sin(phi) * r
    z = cos_phi * jnp.cos(theta) * r
    return jnp.stack([x, y, z], axis=-1)


def cartesian_to_spherical(xyz: jnp.ndarray) -> jnp.ndarray:
    """xyz [..., 3] -> (theta, phi, r) [..., 3]."""
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    theta = jnp.arctan2(x, z)
    rho = jnp.sqrt(x * x + z * z)
    phi = jnp.arctan2(y, rho)
    r = jnp.sqrt(x * x + y * y + z * z)
    return jnp.stack([theta, phi, r], axis=-1)


def spherical_to_erp(tp: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(theta, phi[, r]) [..., >=2] -> ERP pixel coords [..., 2]."""
    theta = tp[..., 0]
    phi = tp[..., 1]
    x = (-theta / TWO_PI + 0.5) * width - 0.5
    y = (-phi / math.pi + 0.5) * height - 0.5
    return jnp.stack([x, y], axis=-1)


def erp_ray_directions(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Unit-sphere ray direction for every ERP pixel. Returns [H, W, 3] (camera frame)."""
    tp = erp_to_spherical(erp_pixel_grid(height, width, dtype), height, width)
    return spherical_to_cartesian(tp)


def unproject_erp_depth(depth: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """ERP (distance) depth map + camera-to-world pose -> world-space 3D points.

    Behavioral parity with get_world_points_with_sphere_projection
    (/root/reference/src/geometry/sphere_projection.py:6-86): unit-sphere ray dirs scaled
    by per-pixel depth, then rigid transform.

    Args:
      depth: [..., H, W] per-pixel euclidean distance along the ray.
      c2w:   [..., 4, 4] camera-to-world pose (broadcast against depth's leading dims).

    Returns:
      [..., H, W, 3] world-space points.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    dirs = erp_ray_directions(h, w, depth.dtype)  # [H, W, 3]
    pts_cam = dirs * depth[..., None]  # [..., H, W, 3]
    rot = c2w[..., None, None, :3, :3]  # [..., 1, 1, 3, 3]
    t = c2w[..., None, None, :3, 3]
    return jnp.einsum("...ij,...j->...i", rot, pts_cam) + t
