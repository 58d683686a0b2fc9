"""Spherical-sweep cost volume + depth predictor (the model's hottest component).

Capability parity with DepthPredictorMultiView360
(/root/reference/src/model/encoder/costvolume/depth_predictor_multiview_360.py):
  * depth candidate ladders: inverse/linear/log spacing between near/far (ref:339-373);
  * spherical sweep: lift every ERP pixel to each candidate radius, rigid-transform
    into each other view, reproject to ERP, bilinearly sample features (ref:159-214) —
    here a vmapped gather with proper azimuth wrap (the reference zero-pads the seam);
  * dot-product correlation averaged over other views (ref:620-631);
  * cost-volume U-Net refiner + residual skip -> softmax pdf -> expected depth
    (ref:632-648);
  * x8 upsample, full-res refine U-Net on [image, features, disparity, pdf_max], and
    to_gaussians / to_disparity heads (ref:652-719).

Layout: [B, V, h, w, C] NHWC; the reference's (v b) folding quirk is gone.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.erp import (
    erp_ray_directions,
    cartesian_to_spherical,
    spherical_to_erp,
)
from ..geometry.transforms import inverse_se3
from ..ops.resample import bilinear_sample
from .layers import bilinear_resize
from .unet import UNet2D


def depth_candidates(
    near: jnp.ndarray, far: jnp.ndarray, num: int, sampling: str
) -> jnp.ndarray:
    """[...] near/far -> [..., D] candidate radii (ref:339-373)."""
    t = jnp.linspace(0.0, 1.0, num, dtype=near.dtype)
    near = near[..., None]
    far = far[..., None]
    if sampling == "inverse_depth":
        inv = 1.0 / far + t * (1.0 / near - 1.0 / far)
        return 1.0 / inv
    if sampling == "log_depth":
        return jnp.exp(jnp.log(near) + t * (jnp.log(far) - jnp.log(near)))
    if sampling == "linear_depth":
        return near + t * (far - near)
    raise ValueError(sampling)


def spherical_sweep_warp(
    features_other: jnp.ndarray,  # [h, w, C] other view's features
    rel_pose: jnp.ndarray,        # [4, 4] maps ref-camera coords -> other-camera coords
    candidates: jnp.ndarray,      # [D] radii
) -> jnp.ndarray:
    """Warp other-view features onto the reference view at each candidate radius.

    Returns [D, h, w, C].
    """
    h, w = features_other.shape[0], features_other.shape[1]
    # geometry stays f32 even under bf16 network compute: bf16 ray dirs
    # quantize the warp coordinates (~0.04 px at 64x128), blurring the very
    # correspondence signal the sweep exists to measure; the gathers below
    # still run in the feature dtype (bilinear_sample casts its weights)
    dirs = erp_ray_directions(h, w, jnp.float32)  # [h, w, 3]
    pts = dirs[None] * candidates[:, None, None, None]  # [D, h, w, 3] ref camera
    pts = (
        jnp.einsum("ij,dhwj->dhwi", rel_pose[:3, :3], pts) + rel_pose[:3, 3]
    )
    sph = cartesian_to_spherical(pts)
    uv = spherical_to_erp(sph, h, w)  # [D, h, w, 2]
    return bilinear_sample(features_other, uv, wrap_x=True)


def build_cost_volume(
    features: jnp.ndarray,    # [B, V, h, w, C]
    extrinsics: jnp.ndarray,  # [B, V, 4, 4] c2w
    candidates: jnp.ndarray,  # [B, V, D]
) -> jnp.ndarray:
    """Per-view correlation cost volume averaged over all other views.

    Returns [B, V, h, w, D].
    """
    b, v, h, w, c = features.shape
    w2c = inverse_se3(extrinsics)  # [B, V, 4, 4]

    def per_batch(feats_b, w2c_b, extr_b, cand_b):
        def per_ref(ref):
            # f32 accumulation of the channel contraction: a 128-term bf16
            # sum loses ~3 mantissa bits exactly where the argmax sharpness
            # of the cost volume lives; the MXU accumulates in f32 anyway,
            # so requesting f32 out is free. Cast back to the network dtype
            # after the view average.
            corr_sum = jnp.zeros((h, w, cand_b.shape[-1]), jnp.float32)
            for other in range(v):
                if other == ref:
                    continue
                rel = w2c_b[other] @ extr_b[ref]  # ref cam -> other cam
                warped = spherical_sweep_warp(
                    feats_b[other], rel, cand_b[ref]
                )  # [D, h, w, C]
                corr = jnp.einsum(
                    "hwc,dhwc->hwd", feats_b[ref], warped,
                    preferred_element_type=jnp.float32,
                ) / (c**0.5)
                corr_sum = corr_sum + corr
            return (corr_sum / (v - 1)).astype(features.dtype)

        # v is static and small (2-4): unrolled python loop over reference views
        return jnp.stack([per_ref(r) for r in range(v)], axis=0)

    return jax.vmap(per_batch)(features, w2c, extrinsics, candidates)


class DepthPredictor360(nn.Module):
    feature_channels: int = 128
    upscale_factor: int = 8
    num_depth_candidates: int = 128
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    gaussian_raw_channels: int = 84
    gaussians_per_pixel: int = 1
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)
    depth_sampling_type: str = "log_depth"
    wo_depth_refine: bool = False
    wo_cost_volume: bool = False
    wo_cost_volume_refine: bool = False
    use_cross_view_self_attn: bool = True

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,      # [B, V, h, w, C] fused ERP features
        cnn_features: jnp.ndarray,  # [B, V, h, w, C]
        images: jnp.ndarray,        # [B, V, H, W, 3] ERP images
        extrinsics: jnp.ndarray,    # [B, V, 4, 4]
        near: jnp.ndarray,          # [B, V]
        far: jnp.ndarray,           # [B, V]
    ):
        b, v, h, w, c = features.shape
        hh, ww = images.shape[2], images.shape[3]
        d = self.num_depth_candidates

        cand = depth_candidates(near, far, d, self.depth_sampling_type)  # [B,V,D]

        # ---- cost volume
        if self.wo_cost_volume:
            corr_in = features
        else:
            corr = build_cost_volume(features, extrinsics, cand)  # [B,V,h,w,D]
            corr_in = jnp.concatenate([corr, features], axis=-1)
        x = corr_in.reshape(b * v, h, w, corr_in.shape[-1])

        # ---- cost volume refinement
        ch = self.costvolume_unet_feat_dim
        if self.wo_cost_volume_refine:
            raw_corr = nn.Conv(ch, (3, 3), name="corr_project")(x)
        else:
            y = nn.Conv(ch, (3, 3))(x)
            y = nn.gelu(nn.GroupNorm(num_groups=8)(y), approximate=False)
            y = UNet2D(
                model_channels=ch,
                out_channels=ch,
                num_res_blocks=1,
                attn_resolutions=tuple(self.costvolume_unet_attn_res),
                channel_mult=tuple(self.costvolume_unet_channel_mult),
                cross_view_attn=self.use_cross_view_self_attn,
                name="corr_refine_unet",
            )(y, num_views=v)
            raw_corr = nn.Conv(d, (3, 3))(y)
            raw_corr = raw_corr + nn.Conv(d, (1, 1), name="regressor_residual")(x)

        # ---- coarse depth via softmax expectation (f32 island: the depth
        # expectation and disparity math stay full precision under bf16
        # network compute)
        y = nn.Conv(2 * d, (3, 3))(raw_corr)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(d, (3, 3))(y)
        pdf = nn.softmax(y.astype(jnp.float32), axis=-1)  # [B*V, h, w, D]
        cand_f = cand.reshape(b * v, 1, 1, d)
        coarse_depth = jnp.sum(pdf * cand_f, axis=-1, keepdims=True)
        coarse_disp = 1.0 / coarse_depth
        pdf_max = jnp.max(pdf, axis=-1, keepdims=True)
        # diagnostics taps (no-op unless apply(..., mutable=["intermediates"]))
        # for the wide-baseline depth-inversion investigation (VERDICT r4 #3)
        self.sow("intermediates", "pdf_entropy",
                 -jnp.mean(jnp.sum(pdf * jnp.log(pdf + 1e-12), axis=-1)))
        self.sow("intermediates", "coarse_depth",
                 coarse_depth.reshape(b, v, h, w))

        fullres_disp = bilinear_resize(coarse_disp, hh, ww)
        pdf_max_full = jnp.repeat(
            jnp.repeat(pdf_max, self.upscale_factor, axis=1),
            self.upscale_factor, axis=2,
        )

        # ---- feature upsampling
        feats_cat = jnp.concatenate([features, cnn_features], axis=-1)
        feats_cat = feats_cat.reshape(b * v, h, w, -1)
        up = nn.Conv(self.feature_channels, (3, 3), name="upsampler_conv")(feats_cat)
        up = bilinear_resize(up, hh, ww)
        proj_in_fullres = nn.gelu(up, approximate=False)  # [B*V, H, W, C]
        proj_feature = nn.Conv(
            self.depth_unet_feat_dim, (3, 3), name="proj_feature"
        )(proj_in_fullres)

        # ---- full-res depth refinement
        imgs = images.reshape(b * v, hh, ww, 3)
        # back into network compute dtype (the f32 disparity island must not
        # promote the refine U-Net's convs to f32)
        refine_in = jnp.concatenate(
            [imgs, proj_feature,
             fullres_disp.astype(features.dtype),
             pdf_max_full.astype(features.dtype)], axis=-1
        )
        du = self.depth_unet_feat_dim
        if self.wo_depth_refine:
            refine_out = nn.Conv(du, (3, 3), name="refine_conv")(refine_in)
        else:
            y = nn.Conv(du, (3, 3))(refine_in)
            y = nn.gelu(nn.GroupNorm(num_groups=4)(y), approximate=False)
            refine_out = UNet2D(
                model_channels=du,
                out_channels=du,
                num_res_blocks=1,
                attn_resolutions=tuple(self.depth_unet_attn_res),
                channel_mult=tuple(self.depth_unet_channel_mult),
                cross_view_attn=self.use_cross_view_self_attn,
                name="refine_unet",
            )(y, num_views=v)

        # ---- gaussian raw-parameter head
        gau_in = jnp.concatenate([refine_out, imgs, proj_in_fullres], axis=-1)
        y = nn.Conv(self.gaussian_raw_channels * 2, (3, 3))(gau_in)
        y = nn.gelu(y, approximate=False)
        raw_gaussians = nn.Conv(self.gaussian_raw_channels, (3, 3))(y)
        raw_gaussians = raw_gaussians.reshape(
            b, v, hh * ww, self.gaussian_raw_channels
        ).astype(jnp.float32)  # adapter geometry math stays f32

        # ---- fine depth + density head
        gpp = self.gaussians_per_pixel
        if self.wo_depth_refine:
            # single coarse surface; broadcast across gpp so the encoder's
            # (pixel, gpp)->gaussian flatten sees the same [.., hw, gpp]
            # layout the refine branch emits (ADVICE r3: gpp>1 crash)
            densities = jnp.broadcast_to(
                pdf_max_full.reshape(b, v, hh * ww, 1), (b, v, hh * ww, gpp)
            )
            depths = jnp.broadcast_to(
                (1.0 / fullres_disp).reshape(b, v, hh * ww, 1),
                (b, v, hh * ww, gpp),
            )
        else:
            y = nn.Conv(du * 2, (3, 3))(refine_out)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(gpp * 2, (3, 3))(y)
            delta_disp, raw_density = jnp.split(y, 2, axis=-1)
            densities = nn.sigmoid(
                raw_density.astype(jnp.float32)
            ).reshape(b, v, hh * ww, gpp)
            lo = (1.0 / far).reshape(b * v, 1, 1, 1)
            hi = (1.0 / near).reshape(b * v, 1, 1, 1)
            # disparity/depth math in f32 (delta from the bf16 head upcast)
            fine_disp = jnp.clip(
                fullres_disp + delta_disp.astype(jnp.float32), lo, hi
            )
            depths = (1.0 / fine_disp).reshape(b, v, hh * ww, gpp)
            self.sow("intermediates", "delta_disp_absmean",
                     jnp.mean(jnp.abs(delta_disp.astype(jnp.float32))))
            self.sow("intermediates", "fullres_disp_absmean",
                     jnp.mean(jnp.abs(fullres_disp)))

        return depths, densities, raw_gaussians
