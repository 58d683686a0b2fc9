"""EncoderCostVolume360: posed panoramas -> pixel-aligned 3D Gaussians.

Capability parity with EncoderCostVolume
(/root/reference/src/model/encoder/encoder_costvolume.py:78-508), redesigned TPU-first:
  (1) optional frozen DINOv2 features on the 6 cube faces -> c2e -> rgbd_fusion MLP
      merge into the cube-branch transformer features (ref:269-297, 349-354);
  (2) cubemap branch: BackboneMultiview over the v*6 faces, c2e both feature sets
      (ref:300-312);
  (3) ERP branch: BackboneMultiview over the ERP images (ref:319-325);
  (4) CEE fusion of the two branches (ref:358-364);
  (5) DepthPredictor360 -> per-pixel depths / densities / raw Gaussian channels
      (ref:388-400);
  (6) GaussianAdapter -> world-space Gaussians; opacity from the warm-up pdf map
      (ref:228-241, 414-426); flattened to Gaussians(means [b,N,3], ...) with
      N = v*H*W (ref:490-507).

Everything is statically shaped, NHWC, (b, v)-major; faces are an explicit axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.cubemap import cube_to_erp
from .adapter import GaussianAdapterConfig, adapt_gaussians, map_pdf_to_opacity
from .backbone import BackboneMultiview, normalize_images
from .costvolume import DepthPredictor360
from .dino import DinoViT, VIT_DIMS
from .layers import FUSION_LAYERS, bilinear_resize
from .types import Gaussians


@dataclass(frozen=True)
class OpacityMappingConfig:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclass(frozen=True)
class EncoderConfig:
    d_feature: int = 128
    num_depth_candidates: int = 128
    num_surfaces: int = 1
    gaussians_per_pixel: int = 1
    downscale_factor: int = 8
    multiview_trans_attn_split: int = 2
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)
    gaussian_adapter: GaussianAdapterConfig = field(
        default_factory=GaussianAdapterConfig
    )
    opacity_mapping: OpacityMappingConfig = field(
        default_factory=OpacityMappingConfig
    )
    depth_sampling_type: str = "log_depth"
    use_cross_view_self_attn: bool = True
    # cube/ERP branch fusion block: "cee" (default) | "concat" | "biproj"
    # (reference ablation surface, geometry/layers.py:119-198)
    fusion_type: str = "cee"
    # bf16 network compute (f32 master params cast per-apply; softmax /
    # depth-expectation / adapter geometry stay f32) — ~2x MXU throughput on
    # TPU for the conv/attention-heavy encoder. Enabled in configs/hm3d.yaml.
    bf16_compute: bool = False
    # ablations (ref Table 3)
    wo_depth_refine: bool = False
    wo_cost_volume: bool = False
    wo_backbone_cross_attn: bool = False
    wo_cost_volume_refine: bool = False
    wo_cube_encoder: bool = False
    wo_erp_encoder: bool = False
    # mono branch
    add_mono_feat: bool = False
    vit_type: str = "vits"
    # epipolar cross-attention ablation (ref use_epipolar_trans,
    # encoder_costvolume.py:41-76 + epipolar_sampler.py)
    use_epipolar_trans: bool = False
    epipolar_num_samples: int = 32


class EncoderCostVolume360(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        image_sphere: jnp.ndarray,       # [B, V, H, W, 3] ERP context images
        image_cubes: jnp.ndarray,        # [B, V, 6, Hc, Wc, 3] cube faces (FRBLUD)
        extrinsics_sphere: jnp.ndarray,  # [B, V, 4, 4]
        near: jnp.ndarray,               # [B, V]
        far: jnp.ndarray,                # [B, V]
        global_step: jnp.ndarray | int = 0,
    ) -> tuple[Gaussians, jnp.ndarray]:
        """Returns (Gaussians, predicted ERP depth [B, V, H, W])."""
        cfg = self.cfg
        b, v, h, w, _ = image_sphere.shape
        cubes = image_cubes.shape[2]
        ds = cfg.downscale_factor
        fh, fw = h // ds, w // ds
        c = cfg.d_feature

        # ---- (1) frozen mono features on cube faces -> ERP
        features_mono = None
        if cfg.add_mono_feat:
            hc, wc = image_cubes.shape[3], image_cubes.shape[4]
            nh, nw = hc // 14 * 14, wc // 14 * 14
            mono_in = normalize_images(image_cubes).reshape(
                b * v * cubes, hc, wc, 3
            )
            mono_in = bilinear_resize(mono_in, nh, nw)
            feats = DinoViT(cfg.vit_type, name="dino")(mono_in)
            feats = jax.lax.stop_gradient(feats)  # frozen branch (ref: no_grad)
            feats = bilinear_resize(feats, hc // ds, wc // ds)
            dim = VIT_DIMS[cfg.vit_type][0]
            feats = feats.reshape(b * v, cubes, hc // ds, wc // ds, dim)
            features_mono = jax.vmap(
                partial(cube_to_erp, equ_h=fh, equ_w=fw)
            )(feats)  # [B*V, fh, fw, dim]

        # ---- (2) cubemap branch
        if not cfg.wo_cube_encoder:
            cube_imgs = image_cubes.reshape(
                b, v * cubes, image_cubes.shape[3], image_cubes.shape[4], 3
            )
            trans_c, cnn_c = BackboneMultiview(
                feature_channels=c,
                downscale_factor=ds,
                no_cross_attn=cfg.wo_backbone_cross_attn,
                name="backbone_cube",
            )(cube_imgs, attn_splits=cfg.multiview_trans_attn_split)
            fhc = trans_c.shape[2]

            def c2e_all(x):
                x = x.reshape(b * v, cubes, fhc, fhc, c)
                return jax.vmap(partial(cube_to_erp, equ_h=fh, equ_w=fw))(x)

            trans_features = c2e_all(trans_c)  # [B*V, fh, fw, C]
            cnn_features = c2e_all(cnn_c)
        else:
            trans_features = jnp.zeros((b * v, fh, fw, c), image_sphere.dtype)
            cnn_features = jnp.zeros((b * v, fh, fw, c), image_sphere.dtype)

        # ---- (3) ERP branch
        if not cfg.wo_erp_encoder:
            trans_e, cnn_e = BackboneMultiview(
                feature_channels=c,
                downscale_factor=ds,
                no_cross_attn=cfg.wo_backbone_cross_attn,
                name="backbone_erp",
            )(image_sphere, attn_splits=cfg.multiview_trans_attn_split)
            trans_erp = trans_e.reshape(b * v, fh, fw, c)
            cnn_erp = cnn_e.reshape(b * v, fh, fw, c)
        else:
            trans_erp = jnp.zeros((b * v, fh, fw, c), image_sphere.dtype)
            cnn_erp = jnp.zeros((b * v, fh, fw, c), image_sphere.dtype)

        # ---- (1b) merge mono features into the cube-branch transformer features
        if features_mono is not None:
            y = jnp.concatenate([trans_features, features_mono], axis=-1)
            y = nn.Dense(c, use_bias=False, name="rgbd_fusion_0")(y)
            y = nn.relu(nn.LayerNorm(name="rgbd_fusion_norm")(y))
            trans_features = nn.Dense(c, use_bias=False, name="rgbd_fusion_1")(y)

        # ---- (4) fuse branches (fusion_type ablation: cee/concat/biproj)
        fusion = FUSION_LAYERS[cfg.fusion_type]
        trans_fused = fusion(c, name="fuse1")(trans_erp, trans_features)
        cnn_fused = fusion(c, name="fuse2")(cnn_erp, cnn_features)
        trans_fused = trans_fused.reshape(b, v, fh, fw, c)
        cnn_fused = cnn_fused.reshape(b, v, fh, fw, c)

        # ---- (4b) optional spherical epipolar cross-attention (ablation)
        if cfg.use_epipolar_trans:
            from .epipolar import EpipolarCrossAttention

            trans_fused = EpipolarCrossAttention(
                d_model=c,
                num_samples=cfg.epipolar_num_samples,
                depth_sampling_type=cfg.depth_sampling_type,
                name="epipolar_trans",
            )(trans_fused, extrinsics_sphere, near, far)

        # ---- (5) cost volume depth prediction
        adapter_cfg = cfg.gaussian_adapter
        raw_channels = cfg.num_surfaces * (adapter_cfg.d_in + 2)
        depths, densities, raw_gaussians = DepthPredictor360(
            feature_channels=c,
            upscale_factor=ds,
            num_depth_candidates=cfg.num_depth_candidates,
            costvolume_unet_feat_dim=cfg.costvolume_unet_feat_dim,
            costvolume_unet_channel_mult=tuple(cfg.costvolume_unet_channel_mult),
            costvolume_unet_attn_res=tuple(cfg.costvolume_unet_attn_res),
            gaussian_raw_channels=raw_channels,
            gaussians_per_pixel=cfg.gaussians_per_pixel,
            depth_unet_feat_dim=cfg.depth_unet_feat_dim,
            depth_unet_attn_res=tuple(cfg.depth_unet_attn_res),
            depth_unet_channel_mult=tuple(cfg.depth_unet_channel_mult),
            depth_sampling_type=cfg.depth_sampling_type,
            wo_depth_refine=cfg.wo_depth_refine,
            wo_cost_volume=cfg.wo_cost_volume,
            wo_cost_volume_refine=cfg.wo_cost_volume_refine,
            use_cross_view_self_attn=cfg.use_cross_view_self_attn,
            name="depth_predictor",
        )(trans_fused, cnn_fused, image_sphere, extrinsics_sphere, near, far)

        # ---- (6) adapt to world-space Gaussians
        om = cfg.opacity_mapping
        opacities = map_pdf_to_opacity(
            densities, jnp.asarray(global_step, jnp.float32),
            om.initial, om.final, om.warm_up,
        ) / cfg.gaussians_per_pixel
        # first-gaussian depth per pixel is the supervised depth map
        depth_map = depths[..., 0].reshape(b, v, h, w)
        # raw layout: [2 skipped (xy-offset legacy), then adapter channels]
        raw = raw_gaussians[..., 2:]
        gpp = cfg.gaussians_per_pixel
        if cfg.num_surfaces != 1:
            raise NotImplementedError(
                "num_surfaces > 1: the reference ships no >1-surface recipe "
                "(config/model/encoder/costvolume.yaml num_surfaces: 1) and "
                "the depth predictor emits one surface"
            )
        if gpp > 1:
            # Reference broadcast semantics (encoder_costvolume.py:404-426):
            # the gpp gaussians of a pixel SHARE raw scale/rot/SH and differ
            # in depth + opacity. Flatten (pixel, gpp) into the gaussian
            # axis, gpp fastest — matching depths' [.., hw, gpp] layout.
            n_pix = depths.shape[2]
            depths = depths.reshape(b, v, n_pix * gpp, 1)
            opacities = opacities.reshape(b, v, n_pix * gpp, 1)
            raw = jnp.repeat(raw, gpp, axis=2)
        gaussians = adapt_gaussians(
            adapter_cfg,
            extrinsics_sphere,
            depths,
            opacities,
            raw,
            (h, w),
        )
        return gaussians, depth_map
