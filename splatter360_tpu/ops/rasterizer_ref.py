"""Dense reference renderer: per-pixel over-compositing of ALL Gaussians (the oracle).

Slow but autograd-exact; serves the role the reference's CUDA rasterizer plays for
correctness (cuda_splatting.py:47-127) and is the golden model the tiled/Pallas path is
validated against to ~1e-5 (SURVEY.md §7 M1). CPU-runnable at the BASELINE config-1
scale (1k Gaussians, 256x512 equirect).

Compositing matches the CUDA kernel's numerics:
  * alpha = min(0.99, opacity * exp(power)); contributions with alpha < 1/255 skipped;
  * front-to-back accumulation terminated (masked) once transmittance < 1e-4;
  * background composited with the final transmittance.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from .projection import (
    Projected, project_erp, project_ortho, project_pinhole, sh_colors,
)


@dataclass(frozen=True)
class Camera:
    """Static-shape camera description. kind is a *static* field (jit constant)."""

    kind: Literal["erp", "pinhole"]
    image_shape: tuple[int, int]


class RenderOutput:
    def __init__(self, color, depth=None, alpha=None, dropped=None):
        self.color = color  # [H, W, 3]
        self.depth = depth  # [H, W] or None
        self.alpha = alpha  # [H, W] or None
        # [] int32 — instances lost to emission-tier/instance caps (tiled path
        # only; a nonzero value means the image is missing splats and the caps
        # need raising). Surfaced into train metrics + eval warnings.
        self.dropped = dropped


def _pixel_grid(h, w, dtype):
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return xx, yy


def composite_dense(
    proj: Projected,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    wrap_x: bool,
    return_depth: bool = False,
    depth_vals=None,
):
    """Depth-sort all Gaussians and alpha-composite them over every pixel.

    colors [N, C]; opacities [N]. Returns (image [H, W, C], trans [H, W], depth?).
    """
    h, w = image_shape
    n = proj.mean2d.shape[0]
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    col = colors[order]
    op = jnp.where(proj.valid, opacities, 0.0)[order]
    dep = (proj.depth if depth_vals is None else depth_vals)[order]
    rad = proj.radius[order]

    xx, yy = _pixel_grid(h, w, mean2d.dtype)

    def step(carry, g):
        rgb, trans, dacc = carry
        m, cn, c, o, d, r = g
        dx = xx - m[0]
        if wrap_x:
            dx = dx - w * jnp.round(dx / w)
        dy = yy - m[1]
        power = -0.5 * (cn[0] * dx * dx + cn[2] * dy * dy) - cn[1] * dx * dy
        alpha = jnp.minimum(0.99, o * jnp.exp(power))
        # Hard window at the per-axis binning radii: identical semantics to the
        # tiled path (which only composites tiles overlapping the 3-sigma box).
        inside = (jnp.abs(dx) <= r[0]) & (jnp.abs(dy) <= r[1])
        alpha = jnp.where(
            inside & (power > -4.5) & (power <= 0.0) & (alpha >= 1.0 / 255.0),
            alpha, 0.0
        )
        # Early termination (CUDA done-flag analogue, order-parallelizable form):
        # T decays by every evaluated alpha; a Gaussian contributes only while the
        # post-decay transmittance stays above 1e-4. Once T crosses the threshold
        # it keeps (invisibly) decaying, so the cutoff is monotone and identical
        # across dense/tiled/Pallas chunked evaluation orders.
        trans_new = trans * (1.0 - alpha)
        weight = jnp.where(trans_new >= 1e-4, alpha * trans, 0.0)
        rgb = rgb + weight[..., None] * c
        dacc = dacc + weight * d
        trans = trans_new
        return (rgb, trans, dacc), None

    init = (
        jnp.zeros((h, w, col.shape[-1]), col.dtype),
        jnp.ones((h, w), col.dtype),
        jnp.zeros((h, w), col.dtype),
    )
    (rgb, trans, dacc), _ = jax.lax.scan(
        step, init, (mean2d, conic, col, op, dep, rad)
    )
    rgb = rgb + trans[..., None] * background
    if return_depth:
        return rgb, trans, dacc
    return rgb, trans, None


def render_dense(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    harmonics: jnp.ndarray,
    opacities: jnp.ndarray,
    c2w: jnp.ndarray,
    image_shape: tuple[int, int],
    camera_kind: str = "erp",
    intrinsics: Optional[jnp.ndarray] = None,
    near: float | jnp.ndarray = 0.1,
    far: float | jnp.ndarray = 100.0,
    background: Optional[jnp.ndarray] = None,
    sh_degree: Optional[int] = None,
    render_depth: bool = False,
    depth_mode: str = "depth",
    ortho_extent: float = 2.0,
) -> RenderOutput:
    """Render one view from world-space Gaussians.

    means [N, 3], covariances [N, 3, 3], harmonics [N, 3, d_sh] (d_sh == 1 means
    precomputed colors, no +0.5 offset — parity with use_sh=False in render_cuda),
    opacities [N], c2w [4, 4]. camera_kind="ortho" renders the paper-figure
    orthographic view (world square of side ortho_extent fills the image).
    """
    h, w = image_shape
    if background is None:
        background = jnp.zeros((3,), means.dtype)
    if sh_degree is None:
        sh_degree = int(math.isqrt(harmonics.shape[-1]) - 1)

    if camera_kind == "erp":
        proj = project_erp(means, covariances, c2w, image_shape, near)
        wrap_x = True
    elif camera_kind == "pinhole":
        assert intrinsics is not None
        proj = project_pinhole(means, covariances, c2w, intrinsics, image_shape, near)
        wrap_x = False
    elif camera_kind == "ortho":
        proj = project_ortho(
            means, covariances, c2w, ortho_extent, image_shape, near, far
        )
        wrap_x = False
    else:
        raise ValueError(camera_kind)

    if harmonics.shape[-1] == 1:
        colors = harmonics[..., 0]
    else:
        colors = sh_colors(harmonics, means, c2w[:3, 3], sh_degree)

    from .rasterizer import transform_depth

    rgb, trans, depth = composite_dense(
        proj, colors, opacities, image_shape, background, wrap_x, render_depth,
        depth_vals=transform_depth(proj.depth, depth_mode, near, far),
    )
    return RenderOutput(color=rgb, depth=depth, alpha=1.0 - trans)
