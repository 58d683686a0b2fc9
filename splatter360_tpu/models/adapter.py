"""GaussianAdapterERP: raw network channels -> world-space Gaussians.

Capability parity with /root/reference/src/model/encoder/common/gaussian_adapter_erp.py:
  * raw channels (3 scale, 4 quat, 3 * d_sh SH) per pixel;
  * scales = (min + (max-min) * sigmoid) * depth * pixel_size (pixel_size = 1/max(W,H));
  * quats normalized; covariance = R S S^T R^T rotated into world by the c2w rotation;
  * SH DC-biased band mask (0.1 * 0.25^degree) and rotation into world frame (our
    projection-based rotate_sh replaces e3nn Wigner-D);
  * means from ERP depth via sphere unprojection (sphere_projection.py:6-86);
  * opacity = warm-up pdf->opacity map applied by the encoder (map_pdf_to_opacity).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..geometry.erp import erp_ray_directions
from ..geometry.sh import num_sh_coeffs, rotate_sh
from ..geometry.transforms import build_covariance_sym6
from .types import Gaussians


@dataclass(frozen=True)
class GaussianAdapterConfig:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 4

    @property
    def d_sh(self) -> int:
        return num_sh_coeffs(self.sh_degree)

    @property
    def d_in(self) -> int:
        """Raw channels consumed per Gaussian: 3 scale + 4 quat + 3*d_sh."""
        return 7 + 3 * self.d_sh


def sh_band_mask(sh_degree: int, dtype=jnp.float32) -> jnp.ndarray:
    mask = jnp.ones((num_sh_coeffs(sh_degree),), dtype)
    for degree in range(1, sh_degree + 1):
        lo, hi = degree**2, (degree + 1) ** 2
        mask = mask.at[lo:hi].set(0.1 * 0.25**degree)
    return mask


def adapt_gaussians(
    cfg: GaussianAdapterConfig,
    extrinsics: jnp.ndarray,    # [B, V, 4, 4] ERP c2w
    depths: jnp.ndarray,        # [B, V, H*W, 1] per-pixel radii
    opacities: jnp.ndarray,     # [B, V, H*W, 1]
    raw_gaussians: jnp.ndarray, # [B, V, H*W, 7 + 3*d_sh]
    image_shape: tuple[int, int],
) -> Gaussians:
    b, v, n, _ = raw_gaussians.shape
    h, w = image_shape
    d_sh = cfg.d_sh

    raw_scales = raw_gaussians[..., 0:3]
    raw_quats = raw_gaussians[..., 3:7]
    raw_sh = raw_gaussians[..., 7 : 7 + 3 * d_sh]

    pixel_size = 1.0 / max(w, h)
    scales = cfg.gaussian_scale_min + (
        cfg.gaussian_scale_max - cfg.gaussian_scale_min
    ) * jnp.reciprocal(1.0 + jnp.exp(-raw_scales))
    scales = scales * depths * pixel_size  # [B, V, N, 3]

    quats = raw_quats / (
        jnp.linalg.norm(raw_quats, axis=-1, keepdims=True) + 1e-8
    )

    sh = raw_sh.reshape(b, v, n, 3, d_sh) * sh_band_mask(cfg.sh_degree)

    # world covariance as sym6: (Rw Rq S)(...)^T fully scalarized — a live
    # [B,V,N,3,3] residual pads (3,3)->(4,128) on TPU (57x HBM, measured 2 GB
    # at hm3d scale); sym6 keeps the decode residual at true size
    c2w_rot = extrinsics[..., :3, :3]  # [B, V, 3, 3]
    covs = build_covariance_sym6(
        scales, quats, world_rot=c2w_rot[:, :, None]
    )  # [B, V, N, 6]

    # world means: unit ERP ray dirs * depth, rotated + translated by c2w.
    # n may be h*w*gpp (gaussians_per_pixel > 1, gpp fastest — see
    # models/encoder.py step 6): every pixel's gpp gaussians share the ray.
    assert n % (h * w) == 0, (n, h, w)
    dirs = erp_ray_directions(h, w, depths.dtype).reshape(h * w, 3)
    if n != h * w:
        dirs = jnp.repeat(dirs, n // (h * w), axis=0)
    pts_cam = dirs * depths  # [B, V, N, 3] (broadcast over leading dims)
    means = (
        jnp.einsum("bvij,bvnj->bvni", c2w_rot, pts_cam)
        + extrinsics[..., None, :3, 3]
    )

    sh_world = rotate_sh(sh, c2w_rot[:, :, None], cfg.sh_degree)

    return Gaussians(
        means=means.reshape(b, v * n, 3),
        covariances=covs.reshape(b, v * n, 6),
        harmonics=sh_world.reshape(b, v * n, 3, d_sh),
        opacities=opacities[..., 0].reshape(b, v * n),
    )


def map_pdf_to_opacity(
    pdf: jnp.ndarray, global_step: jnp.ndarray, initial: float, final: float,
    warm_up: int,
) -> jnp.ndarray:
    """Warm-up density->opacity map (encoder_costvolume.py:228-241)."""
    frac = jnp.minimum(global_step / max(warm_up, 1), 1.0)
    x = initial + frac * (final - initial)
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))
