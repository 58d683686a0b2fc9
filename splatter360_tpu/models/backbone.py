"""CNN backbone + multi-view wrapper (the reference's UniMatch feature stack).

Capability parity with:
  * CNNEncoder (/root/reference/src/model/encoder/backbone/unimatch/backbone.py:39-122):
    7x7 stride-2 stem + 3 residual stages -> 1/8 (or 1/4) resolution, 128-ch output.
  * BackboneMultiview (/root/reference/src/model/encoder/backbone/backbone_multiview.py:
    36-185): ImageNet normalization, CNN features, windowed sine positional embedding,
    multi-view Swin transformer; returns (transformer features, CNN features).
NHWC layout; view axis handled by folding into batch (static shapes throughout).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import InstanceNorm, ResidualBlock
from .transformer import MultiViewFeatureTransformer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize [..., H, W, 3] images in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


class CNNEncoder(nn.Module):
    output_dim: int = 128
    downscale_factor: int = 8

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> [B, H/d, W/d, output_dim]."""
        dims = (64, 96, 128)
        x = nn.Conv(dims[0], (7, 7), strides=(2, 2), use_bias=False)(x)  # 1/2
        x = nn.relu(InstanceNorm()(x))

        if self.downscale_factor in (4, 8):
            stride1, stride3 = 1, (2 if self.downscale_factor == 8 else 1)
        elif self.downscale_factor == 16:
            stride1, stride3 = 2, 2
        else:
            raise NotImplementedError(self.downscale_factor)

        x = ResidualBlock(dims[0], stride=stride1)(x)
        x = ResidualBlock(dims[0])(x)
        x = ResidualBlock(dims[1], stride=2)(x)  # 1/4
        x = ResidualBlock(dims[1])(x)
        x = ResidualBlock(dims[2], stride=stride3)(x)  # 1/8
        x = ResidualBlock(dims[2])(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


def sine_position_embedding(h: int, w: int, channels: int, dtype=jnp.float32):
    """2D sine/cosine positional embedding [h, w, channels]
    (PositionEmbeddingSine parity, unimatch/position.py:9-46)."""
    num_feats = channels // 2
    temperature = 10000.0
    scale = 2 * math.pi
    y = (jnp.arange(h, dtype=dtype) + 1.0)[:, None]
    x = (jnp.arange(w, dtype=dtype) + 1.0)[None, :]
    eps = 1e-6
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x[..., None] / dim_t  # [h?, w, f]
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(1, w, num_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, 1, num_feats)
    pos_x = jnp.broadcast_to(pos_x, (h, w, num_feats))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_feats))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class BackboneMultiview(nn.Module):
    """CNN + windowed sine pos-emb + multi-view Swin transformer."""

    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    downscale_factor: int = 8
    no_cross_attn: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, attn_splits: int = 2):
        """images: [B, V, H, W, 3] in [0, 1].

        Returns (trans_features [B, V, h, w, C], cnn_features [B, V, h, w, C]).
        """
        b, v, h, w, _ = images.shape
        x = normalize_images(images).reshape(b * v, h, w, 3)
        feats = CNNEncoder(
            output_dim=self.feature_channels,
            downscale_factor=self.downscale_factor,
        )(x)
        fh, fw = feats.shape[1], feats.shape[2]
        cnn_features = feats.reshape(b, v, fh, fw, self.feature_channels)

        # windowed positional embedding: computed on the window grid then tiled,
        # equivalent to split -> add -> merge in the reference (attn_splits windows).
        if attn_splits > 1:
            wh, ww = fh // attn_splits, fw // attn_splits
            pos = sine_position_embedding(wh, ww, self.feature_channels)
            pos = jnp.tile(pos, (attn_splits, attn_splits, 1))
        else:
            pos = sine_position_embedding(fh, fw, self.feature_channels)
        feats_pos = cnn_features + pos.astype(cnn_features.dtype)

        trans_features = MultiViewFeatureTransformer(
            num_layers=self.num_transformer_layers,
            d_model=self.feature_channels,
            ffn_dim_expansion=self.ffn_dim_expansion,
            no_cross_attn=self.no_cross_attn,
        )(feats_pos, attn_splits=attn_splits)

        return trans_features, cnn_features
