"""Differentiable gather-based bilinear resampling (device-side, jit-friendly).

TPU-native replacement for the reference's torch F.grid_sample uses:
  * the spherical-sweep warp (/root/reference/src/model/encoder/costvolume/
    depth_predictor_multiview_360.py:196-214),
  * the Cube2Equirec 3D grid_sample (/root/reference/src/geometry/layers.py:108-116),
  * the CPU scipy map_coordinates Equirec2Cube (/root/reference/src/geometry/util.py:71-101)
    — which we move on-device.

Coordinates are *pixel* coordinates (align to pixel centers: coordinate p samples pixel
round(p); integer coords hit pixel centers exactly), unlike torch's normalized [-1, 1]
grids. Wrap modes handle the ERP azimuth seam.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; ix, iy: [...] int32 -> [..., C]."""
    return img[iy, ix]


def bilinear_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    wrap_x: bool = False,
    fill_value: float | None = None,
) -> jnp.ndarray:
    """Bilinearly sample img [H, W, C] at pixel coords [..., 2] (x, y).

    wrap_x: wrap horizontally (ERP azimuth seam).
    fill_value: if given, out-of-bounds samples (in y, and x when not wrapping) return
      this value ("zeros"-style padding); otherwise coordinates are clamped to the edge
      ("border"-style padding).
    Differentiable w.r.t. both img and coords.
    """
    h, w = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if wrap_x:
        x0m = jnp.mod(x0, w)
        x1m = jnp.mod(x1, w)
    else:
        x0m = jnp.clip(x0, 0, w - 1)
        x1m = jnp.clip(x1, 0, w - 1)
    y0m = jnp.clip(y0, 0, h - 1)
    y1m = jnp.clip(y1, 0, h - 1)

    v00 = _gather_2d(img, x0m, y0m)
    v01 = _gather_2d(img, x1m, y0m)
    v10 = _gather_2d(img, x0m, y1m)
    v11 = _gather_2d(img, x1m, y1m)

    # weights in the image dtype: f32 coords must not promote bf16 features
    # back to f32 under mixed-precision compute
    tx = tx[..., None].astype(img.dtype)
    ty = ty[..., None].astype(img.dtype)
    out = (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )

    if fill_value is not None:
        in_y = (y >= -1.0) & (y <= h * 1.0)
        if wrap_x:
            valid = in_y
        else:
            valid = in_y & (x >= -1.0) & (x <= w * 1.0)
        out = jnp.where(valid[..., None], out, jnp.asarray(fill_value, img.dtype))
    return out


def bilinear_sample_3d_faces(
    faces: jnp.ndarray,
    face_idx: jnp.ndarray,
    coords: jnp.ndarray,
) -> jnp.ndarray:
    """Sample a 6-face cubemap stack: faces [6, H, W, C], face_idx [...] int, coords
    [..., 2] pixel coords within the selected face (border-clamped).

    Equivalent role to the reference's 3D grid_sample in Cube2Equirec (layers.py:108-116)
    with nearest selection along the face axis.
    """
    h, w = faces.shape[1], faces.shape[2]
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = (x - x0f)[..., None].astype(faces.dtype)
    ty = (y - y0f)[..., None].astype(faces.dtype)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    f = face_idx.astype(jnp.int32)
    v00 = faces[f, y0, x0]
    v01 = faces[f, y0, x1]
    v10 = faces[f, y1, x0]
    v11 = faces[f, y1, x1]
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )
