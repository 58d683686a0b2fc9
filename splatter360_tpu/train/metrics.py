"""Evaluation metrics (SURVEY.md §2.6 parity, /root/reference/src/evaluation/metrics.py
and src/scripts/compute_depth_metrics.py).

  * PSNR with clipping and the 1e-10 mse floor (metrics.py:11-22);
  * SSIM matching skimage structural_similarity(win_size=11, gaussian_weights=True,
    data_range=1) — gaussian window sigma 1.5, sample covariance normalization;
  * LPIPS via train.lpips_jax (weights required for parity, see that module);
  * SimpleRecon-style masked depth metrics (compute_depth_metrics.py:6-115).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_psnr(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """gt, pred [B, H, W, C] in [0, 1] -> [B]."""
    gt = jnp.clip(gt, 0.0, 1.0)
    pred = jnp.clip(pred, 0.0, 1.0)
    mse = jnp.mean((gt - pred) ** 2, axis=(-3, -2, -1))
    mse = jnp.maximum(mse, 1e-10)
    return -10.0 * jnp.log10(mse)


def _gaussian_kernel(win: int = 11, sigma: float = 1.5):
    r = np.arange(win) - win // 2
    k = np.exp(-0.5 * (r / sigma) ** 2)
    k /= k.sum()
    return jnp.asarray(k, jnp.float32)


def _filter2d_sep(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """'valid' separable filter over the last two axes of [..., H, W]."""
    win = k.shape[0]
    # horizontal
    xh = jnp.stack(
        [x[..., :, i : x.shape[-1] - win + 1 + i] for i in range(win)], axis=0
    )
    x = jnp.einsum("k...,k->...", xh, k)
    xv = jnp.stack(
        [x[..., i : x.shape[-2] - win + 1 + i, :] for i in range(win)], axis=0
    )
    return jnp.einsum("k...,k->...", xv, k)


def compute_ssim(
    gt: jnp.ndarray, pred: jnp.ndarray, data_range: float = 1.0,
    sample_covariance: bool = True,
) -> jnp.ndarray:
    """gt, pred [B, H, W, C] -> [B]; skimage-exact gaussian-weighted SSIM.

    Replicates skimage.metrics.structural_similarity(win_size=11,
    gaussian_weights=True, sigma=1.5, channel_axis=0, data_range) as the
    reference calls it (metrics.py:39-54):
      * gaussian filter truncate=3.5 -> radius 5; skimage crops (win-1)//2
        border pixels from the SSIM map, so filtering over 'valid' windows is
        identical (every kept window sees only real pixels);
      * the reference leaves use_sample_covariance=True (the skimage default),
        so variances/covariance are scaled by cov_norm = NP/(NP-1), NP = 11^2.
    Set sample_covariance=False for the plain Wang-et-al. formulation.
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    k = _gaussian_kernel()
    win = k.shape[0]
    cov_norm = win**2 / (win**2 - 1.0) if sample_covariance else 1.0
    x = jnp.moveaxis(gt, -1, 1)    # [B, C, H, W]
    y = jnp.moveaxis(pred, -1, 1)
    mu_x = _filter2d_sep(x, k)
    mu_y = _filter2d_sep(y, k)
    mu_xx = _filter2d_sep(x * x, k)
    mu_yy = _filter2d_sep(y * y, k)
    mu_xy = _filter2d_sep(x * y, k)
    vx = cov_norm * (mu_xx - mu_x * mu_x)
    vy = cov_norm * (mu_yy - mu_y * mu_y)
    cxy = cov_norm * (mu_xy - mu_x * mu_y)
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (vx + vy + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def compute_depth_metrics(
    gt: jnp.ndarray,    # [..., H, W]
    pred: jnp.ndarray,  # [..., H, W]
    mask: jnp.ndarray,  # [..., H, W] bool (valid GT)
) -> dict:
    """SimpleRecon metric set with masked means (compute_depth_metrics.py:47-115)."""
    m = mask.astype(gt.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)

    def mmean(x):
        return jnp.sum(x * m) / n

    gt_s = jnp.where(mask, gt, 1.0)
    pred_s = jnp.where(mask, pred, 1.0)
    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    abs_diff = jnp.abs(gt_s - pred_s)
    abs_rel = abs_diff / gt_s
    sq_rel = (gt_s - pred_s) ** 2 / gt_s
    log_diff = jnp.log(jnp.maximum(pred_s, 1e-8)) - jnp.log(jnp.maximum(gt_s, 1e-8))
    return {
        "abs_diff": mmean(abs_diff),
        "abs_rel": mmean(abs_rel),
        "sq_rel": mmean(sq_rel),
        "rmse": jnp.sqrt(mmean((gt_s - pred_s) ** 2)),
        "rmse_log": jnp.sqrt(mmean(log_diff**2)),
        "a5": mmean((thresh < 1.05).astype(gt.dtype)) * 100.0,
        "a10": mmean((thresh < 1.10).astype(gt.dtype)) * 100.0,
        "a25": mmean((thresh < 1.25).astype(gt.dtype)) * 100.0,
        "a1": mmean((thresh < 1.25).astype(gt.dtype)),
        "a2": mmean((thresh < 1.25**2).astype(gt.dtype)),
        "a3": mmean((thresh < 1.25**3).astype(gt.dtype)),
    }
