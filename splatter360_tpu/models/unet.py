"""2D U-Net with optional cross-view self-attention (cost-volume + depth refiners).

Capability parity with the reference's stripped LDM UNetModel
(/root/reference/src/model/encoder/costvolume/ldm_unet/unet.py:606-1160): ResBlocks +
attention at configured downsample ratios, channel multipliers per level, middle block
with attention, skip-connected decoder; `use_cross_view_self_attn` makes attention span
all views' tokens jointly (ref unet.py:527-570). No time conditioning.

TPU-first: NHWC, nn.remat on ResBlocks (the reference hardwires activation
checkpointing in its attention blocks, ldm_unet/unet.py:362); attention is full
self-attention at low resolutions only (as configured by attn_resolutions).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _gn(c: int) -> nn.Module:
    return nn.GroupNorm(num_groups=min(32, c))


class ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = _gn(x.shape[-1])(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3))(h)
        h = _gn(self.out_channels)(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3),
            kernel_init=nn.initializers.zeros,  # zero-init last conv (LDM convention)
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over spatial tokens; optionally across views jointly."""

    num_head_channels: int = 32
    cross_view: bool = True

    @nn.compact
    def __call__(self, x, num_views: int):
        """x: [B*V, H, W, C]."""
        bv, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        y = _gn(c)(x).reshape(bv, h * w, c)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], heads, c // heads)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        if self.cross_view and num_views > 1:
            b = bv // num_views
            # tokens from all views attend jointly: [B, V*L, heads, d]
            q = q.reshape(b, num_views * h * w, heads, c // heads)
            k = k.reshape(b, num_views * h * w, heads, c // heads)
            v = v.reshape(b, num_views * h * w, heads, c // heads)
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / (c // heads) ** 0.5
        # f32 softmax for bf16 compute (standard mixed-precision hygiene)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            scores.dtype
        )
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v)
        out = out.reshape(bv, h * w, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(bv, h, w, c)


class UNet2D(nn.Module):
    model_channels: int
    out_channels: int
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    channel_mult: Sequence[int] = (1, 1, 1)
    num_head_channels: int = 32
    cross_view_attn: bool = True

    @nn.compact
    def __call__(self, x, num_views: int = 2):
        """x: [B*V, H, W, C_in] -> [B*V, H, W, out_channels]."""
        res_block = nn.remat(ResBlock)
        ch = self.model_channels
        h = nn.Conv(ch, (3, 3))(x)
        skips = [h]
        ds = 1
        # encoder
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res_block(mult * self.model_channels)(h)
                if ds in self.attn_resolutions:
                    h = AttentionBlock(
                        self.num_head_channels, self.cross_view_attn
                    )(h, num_views)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2))(h)  # downsample
                ds *= 2
                skips.append(h)
        # middle
        h = res_block(h.shape[-1])(h)
        if self.attn_resolutions:
            h = AttentionBlock(self.num_head_channels, self.cross_view_attn)(
                h, num_views
            )
        h = res_block(h.shape[-1])(h)
        # decoder
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res_block(mult * self.model_channels)(h)
                if ds in self.attn_resolutions:
                    h = AttentionBlock(
                        self.num_head_channels, self.cross_view_attn
                    )(h, num_views)
                if level and i == self.num_res_blocks:
                    # upsample (nearest + conv)
                    bh, hh, ww, cc = h.shape
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = nn.Conv(cc, (3, 3))(h)
                    ds //= 2
        h = _gn(h.shape[-1])(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), kernel_init=nn.initializers.zeros
        )(h)
