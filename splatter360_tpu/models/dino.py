"""DINOv2-style ViT (frozen monocular feature branch).

Capability parity with the reference's torch.hub DINOv2 ViT-S/14 usage
(/root/reference/src/model/encoder/encoder_costvolume.py:107-125, 269-297): patch-14
ViT, last-layer patch tokens (no CLS) bilinearly resized to the backbone feature
resolution. The reference runs it frozen under no_grad; here the caller passes its
params via `frozen_params` and simply excludes them from the optimizer pytree.

Weights: zero-egress environment — weights can be converted from a local torch
checkpoint via load_dinov2_torch_weights; with no checkpoint the branch can be
disabled (add_mono_feat=False) or run randomly initialized (ablation only).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

VIT_DIMS = {"vits": (384, 6, 12), "vitb": (768, 12, 12), "vitl": (1024, 16, 24)}


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (self.dim,))
        x = x + y * ls1
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * 4)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim)(y)
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (self.dim,))
        return x + y * ls2


class DinoViT(nn.Module):
    """Patch-14 ViT returning last-layer patch tokens as a feature map."""

    vit_type: str = "vits"
    patch: int = 14

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] (ImageNet-normalized, H/W multiples of 14)
        -> [B, H/14, W/14, dim]."""
        dim, heads, depth = VIT_DIMS[self.vit_type]
        b, h, w, _ = images.shape
        gh, gw = h // self.patch, w // self.patch
        x = nn.Conv(
            dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            name="patch_embed",
        )(images)
        x = x.reshape(b, gh * gw, dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, gh * gw, dim)
        )
        x = x + pos
        for i in range(depth):
            x = ViTBlock(dim, heads, name=f"block{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return x.reshape(b, gh, gw, dim)
