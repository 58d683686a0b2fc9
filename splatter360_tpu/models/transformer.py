"""Multi-view Swin-style feature transformer.

Capability parity with MultiViewFeatureTransformer
(/root/reference/src/model/encoder/backbone/multiview_transformer.py:8-657): N layers of
(self-attention + cross-view attention + FFN), single-head, shifted-window attention
with `attn_splits` windows per axis; each view's cross-attention keys/values are the
*other* views' tokens at the same window position (multi-view KV packing, ref:503-523).

TPU-first implementation notes: window partition is a reshape (static shapes), shifts
are jnp.roll, the shifted-window mask is a precomputed constant, and attention is plain
batched matmul softmax (XLA fuses; windows of ~2k tokens sit well on the MXU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


@functools.lru_cache(maxsize=32)
def _shifted_window_mask(h: int, w: int, splits: int) -> np.ndarray:
    """Swin SW-MSA mask: [nW, L, L] additive (-100 off-region) float32."""
    wh, ww = h // splits, w // splits
    sh, sw = wh // 2, ww // 2
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - wh), slice(h - wh, h - sh), slice(h - sh, None)):
        for ws in (slice(0, w - ww), slice(w - ww, w - sw), slice(w - sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(splits, wh, splits, ww).transpose(0, 2, 1, 3)
    win = win.reshape(splits * splits, wh * ww)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _partition(x: jnp.ndarray, splits: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., nW, L, C] with nW = splits^2, L = (H/s)*(W/s)."""
    *lead, h, w, c = x.shape
    wh, ww = h // splits, w // splits
    x = x.reshape(*lead, splits, wh, splits, ww, c)
    x = jnp.moveaxis(x, -3, -4)  # [..., splits, splits, wh, ww, c]
    return x.reshape(*lead, splits * splits, wh * ww, c)


def _merge(x: jnp.ndarray, splits: int, h: int, w: int) -> jnp.ndarray:
    *lead, nw, l, c = x.shape
    wh, ww = h // splits, w // splits
    x = x.reshape(*lead, splits, splits, wh, ww, c)
    x = jnp.moveaxis(x, -4, -3)  # [..., splits, wh, splits, ww, c]
    return x.reshape(*lead, h, w, c)


class TransformerLayer(nn.Module):
    """Single-head attention layer (ref TransformerLayer, multiview_transformer.py:292-
    411): q/k/v/out projections (no bias), post-norm, optional concat-FFN."""

    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(self, source, target, mask=None):
        """source [..., L, C]; target [..., M, C]; mask broadcastable [..., L, M]."""
        c = self.d_model
        q = nn.Dense(c, use_bias=False, name="q_proj")(source)
        k = nn.Dense(c, use_bias=False, name="k_proj")(target)
        v = nn.Dense(c, use_bias=False, name="v_proj")(target)
        scores = jnp.einsum("...lc,...mc->...lm", q, k) / (c**0.5)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        # f32 softmax for bf16 compute (standard mixed-precision hygiene)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            scores.dtype
        )
        message = jnp.einsum("...lm,...mc->...lc", attn, v)
        message = nn.Dense(c, use_bias=False, name="merge")(message)
        message = nn.LayerNorm(name="norm1")(message)
        if not self.no_ffn:
            y = jnp.concatenate([source, message], axis=-1)
            y = nn.Dense(2 * c * self.ffn_dim_expansion, use_bias=False)(y)
            y = nn.gelu(y, approximate=False)
            message = nn.Dense(c, use_bias=False)(y)
            message = nn.LayerNorm(name="norm2")(message)
        return source + message


class MultiViewFeatureTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    no_cross_attn: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, attn_splits: int = 2):
        """features: [B, V, H, W, C] -> same shape."""
        b, v, h, w, c = features.shape
        mask_np = _shifted_window_mask(h, w, attn_splits)
        shift_mask = jnp.asarray(mask_np)  # [nW, L, L]
        wh, ww = h // attn_splits, w // attn_splits
        sh, sw = wh // 2, ww // 2

        x = features
        for layer in range(self.num_layers):
            with_shift = layer % 2 == 1

            def windowed_attention(attn_module, xs, cross: bool):
                y = xs
                if with_shift:
                    y = jnp.roll(y, shift=(-sh, -sw), axis=(-3, -2))
                win = _partition(y, attn_splits)  # [B, V, nW, L, C]
                if cross and v > 1:
                    # KV = other views' tokens at the same window position.
                    kv = jnp.stack(
                        [
                            jnp.concatenate(
                                [win[:, j] for j in range(v) if j != i], axis=-2
                            )
                            for i in range(v)
                        ],
                        axis=1,
                    )  # [B, V, nW, (V-1)L, C]
                    m = (
                        jnp.tile(shift_mask, (1, 1, v - 1)) if with_shift else None
                    )
                    out = attn_module(win, kv, m)
                else:
                    m = shift_mask if with_shift else None
                    out = attn_module(win, win, m)
                out = _merge(out, attn_splits, h, w)
                if with_shift:
                    out = jnp.roll(out, shift=(sh, sw), axis=(-3, -2))
                return out

            if self.no_cross_attn:
                x = windowed_attention(
                    TransformerLayer(
                        self.d_model, no_ffn=False,
                        ffn_dim_expansion=self.ffn_dim_expansion,
                        name=f"layer{layer}_self",
                    ),
                    x, cross=False,
                )
            else:
                x = windowed_attention(
                    TransformerLayer(
                        self.d_model, no_ffn=True,
                        ffn_dim_expansion=self.ffn_dim_expansion,
                        name=f"layer{layer}_self",
                    ),
                    x, cross=False,
                )
                x = windowed_attention(
                    TransformerLayer(
                        self.d_model, no_ffn=False,
                        ffn_dim_expansion=self.ffn_dim_expansion,
                        name=f"layer{layer}_cross",
                    ),
                    x, cross=True,
                )
        return x
