"""Training losses (SURVEY.md §2.6 parity).

  * MSE on rendered target views vs supervision images, weight 1 (loss_mse.py:22-31);
  * LPIPS-VGG, weight 0.05, apply_after_step gate (loss_lpips.py:28-55);
  * sin(phi)-weighted ERP depth L1 with eroded hole mask, weight 0.1, holes set to
    far (model_wrapper_erp.py:242-287, model_wrapper_helper.py:3-89);
  * edge-aware depth smoothness (loss_depth.py:26-60, optional — not in the default
    hm3d recipe).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class LossConfig:
    mse_weight: float = 1.0
    lpips_weight: float = 0.05
    lpips_apply_after_step: int = 0
    # Path to a torch LPIPS(net='vgg') / torchvision-vgg16 checkpoint. None ->
    # deterministic seeded features (loudly flagged; see lpips_jax.make_lpips_fn).
    lpips_weights: str | None = None
    depth_weight: float = 0.1
    depth_smoothness_weight: float = 0.0


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def max_pool_dilate(mask: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Binary dilation via max-pool (model_wrapper_helper.dilate). mask [..., H, W]."""
    pad = (ksize - 1) // 2
    x = jnp.pad(
        mask,
        [(0, 0)] * (mask.ndim - 2) + [(pad, pad), (pad, pad)],
        mode="reflect",
    )
    out = mask
    # separable max filter
    windows = jnp.stack(
        [x[..., i : i + mask.shape[-2], pad : pad + mask.shape[-1]]
         for i in range(ksize)], axis=0
    )
    out = jnp.max(windows, axis=0)
    x2 = jnp.pad(
        out, [(0, 0)] * (mask.ndim - 2) + [(0, 0), (pad, pad)], mode="reflect"
    )
    windows = jnp.stack(
        [x2[..., :, i : i + mask.shape[-1]] for i in range(ksize)], axis=0
    )
    return jnp.max(windows, axis=0)


def erode(mask: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    return 1.0 - max_pool_dilate(1.0 - mask, ksize)


def sin_weighted_depth_l1(
    pred_depth: jnp.ndarray,   # [B, V, H, W] encoder-predicted ERP depth
    gt_depth: jnp.ndarray,     # [B, V, H, W] ground-truth ERP depth (0 = hole)
    far: jnp.ndarray,          # [B, V]
    hole_threshold: float = 0.1,
) -> jnp.ndarray:
    """ERP depth supervision (model_wrapper_erp.py:242-287):
    sin(phi)-weighted L1, hole mask (> 0.1 m) eroded 5x5, holes set to far."""
    h = pred_depth.shape[-2]
    mask = (gt_depth > hole_threshold).astype(pred_depth.dtype)
    mask = erode(mask, 5)
    gt = jnp.where(mask > 0.5, gt_depth, far[..., None, None])

    rows = jnp.arange(h, dtype=pred_depth.dtype)
    sin_phi = jnp.sin((rows + 0.5) * math.pi / h)[None, None, :, None]
    weight = sin_phi * mask
    num = jnp.sum(jnp.abs(gt - pred_depth) * weight)
    den = jnp.maximum(jnp.sum(weight), 1e-10)
    return num / den


def depth_smoothness_loss(
    rendered_depth: jnp.ndarray,  # [..., H, W]
    image: jnp.ndarray,           # [..., H, W, 3] ground truth
    near: jnp.ndarray,
    far: jnp.ndarray,
    sigma_image: float | None = None,
    use_second_derivative: bool = False,
) -> jnp.ndarray:
    """Edge-aware depth gradient loss (loss_depth.py:26-60)."""
    lo = jnp.log(near)[..., None, None]
    hi = jnp.log(far)[..., None, None]
    d = jnp.clip(rendered_depth, None, None)
    d = jnp.clip(jnp.log(jnp.maximum(rendered_depth, 1e-8)), lo, hi)
    d = (d - lo) / (hi - lo)
    dx = jnp.diff(d, axis=-1)
    dy = jnp.diff(d, axis=-2)
    if use_second_derivative:
        dx = jnp.diff(dx, axis=-1)
        dy = jnp.diff(dy, axis=-2)
    if sigma_image is not None:
        cx = jnp.max(jnp.abs(jnp.diff(image, axis=-2)), axis=-1)
        cy = jnp.max(jnp.abs(jnp.diff(image, axis=-3)), axis=-1)
        if use_second_derivative:
            cx = jnp.maximum(cx[..., :, 1:], cx[..., :, :-1])
            cy = jnp.maximum(cy[..., 1:, :], cy[..., :-1, :])
        dx = dx * jnp.exp(-cx * sigma_image)
        dy = dy * jnp.exp(-cy * sigma_image)
    return jnp.mean(jnp.abs(dx)) + jnp.mean(jnp.abs(dy))
