"""Encoder visualizer (SURVEY.md §2.4 parity with
src/model/encoder/visualization/encoder_visualizer_costvolume.py:33-527).

Debug renders of what the encoder predicted: per-pixel ERP depth, Gaussian
opacity, scale (mean stddev from the covariance trace), and DC color maps,
laid out as one labeled sheet per context view. The reference's hook-based
attention/epipolar dumps are train-debug-only and effectively disabled in val
(encoder_visualizer_costvolume.py constructed but unused); the per-Gaussian
maps here are the load-bearing part.
"""

from __future__ import annotations

import math

import numpy as np

from ..utils.image_io import add_label, apply_depth_colormap, hcat, vcat

_SH_C0 = 0.28209479177387814


def visualize_gaussians(
    gaussians,
    depth_map,
    context_images,
    image_shape,
) -> np.ndarray:
    """Build the encoder-debug sheet for batch item 0.

    gaussians: Gaussians with means [b, v*h*w, 3] (pixel-aligned, view-major);
    depth_map: [b, v, h, w] (or [b, v, h, w, 1]) encoder ERP depth;
    context_images: [b, v, h, w, 3]; image_shape: (h, w).
    Returns an [H', W', 3] float image.
    """
    h, w = image_shape
    imgs = np.asarray(context_images[0])
    v = imgs.shape[0]

    opac = np.asarray(gaussians.opacities[0]).reshape(v, h, w)
    # mean stddev: sqrt(trace/3) of the world covariance ([.., 3, 3] or sym6)
    cov = np.asarray(gaussians.covariances[0])
    if cov.shape[-1] == 6:
        trace = cov[..., 0] + cov[..., 3] + cov[..., 5]
    else:
        trace = np.trace(
            cov.reshape(v, h, w, 3, 3), axis1=-2, axis2=-1
        ).reshape(-1)
    scale = np.sqrt(np.maximum(trace.reshape(v, h, w) / 3.0, 0.0))
    dc = np.asarray(gaussians.harmonics[0][..., 0]).reshape(v, h, w, 3)
    dc_rgb = np.clip(dc * _SH_C0 + 0.5, 0.0, 1.0)
    depth = np.asarray(depth_map[0])
    if depth.ndim == 4:
        depth = depth[..., 0]

    rows = []
    for vi in range(v):
        cells = [
            add_label(imgs[vi], f"context {vi}"),
            add_label(apply_depth_colormap(depth[vi]), "encoder depth"),
            add_label(np.repeat(opac[vi][..., None], 3, axis=-1), "opacity"),
            add_label(apply_depth_colormap(np.log10(scale[vi] + 1e-8)),
                      "log10 scale"),
            add_label(dc_rgb[vi], "SH DC color"),
        ]
        rows.append(hcat(*cells, pad=2))
    return vcat(*rows, pad=2)
