"""Tiled differentiable Gaussian rasterizer — the production render path.

Pipeline (TPU-first redesign of the reference's CUDA rasterizer, SURVEY.md §2.9/§7 M2):
  1. project (ops/projection.py, plain JAX — autograd carries gradients from 2D screen
     params back to 3D means/covariances/SH exactly like the CUDA backward chain);
  2. SH -> view-dependent colors (plain JAX);
  3. tile binning + lexicographic (tile, depth) sort (ops/tiling.py);
  4. per-tile front-to-back compositing — `backend="jax"` uses the vmapped scan
     fallback (ops/composite_jax.py), `backend="pallas"` the Mosaic kernel
     (ops/pallas/composite.py) whose custom VJP computes analytic gradients w.r.t.
     per-instance (mean2d, conic, color, opacity); the instance gather's transpose
     scatter-adds those into per-Gaussian gradients automatically.

Batch over views/scenes with jax.vmap; all shapes static.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from .projection import project_erp, project_pinhole, sh_colors
from .tiling import assign_tiles
from .composite_jax import composite_tiles_jax
from .rasterizer_ref import RenderOutput

DEPTH_MODES = ("depth", "log", "disparity", "relative_disparity")


def transform_depth(depth, mode, near, far):
    """Per-gaussian depth transform before compositing.

    Mirrors the reference's depth rendering modes (decoder.py:11-17,
    cuda_splatting.py:226-269: the transformed camera-space depth is rendered
    AS the color, so the composite is the alpha-weighted transformed depth):
      depth                raw camera distance
      log                  log(depth)
      disparity            1/depth
      relative_disparity   (1/depth - 1/far) / (1/near - 1/far) in [0, 1]
    """
    if mode == "depth":
        return depth
    d = jnp.maximum(depth, 1e-8)
    if mode == "log":
        return jnp.log(d)
    if mode == "disparity":
        return 1.0 / d
    if mode == "relative_disparity":
        return (1.0 / d - 1.0 / far) / (1.0 / near - 1.0 / far)
    raise ValueError(f"unknown depth_mode {mode!r}; expected {DEPTH_MODES}")


def render_tiled(
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
    backend: str = "pallas",
    max_per_tile: int = 512,
    instance_cap: Optional[int] = None,
    tier_caps: Optional[tuple[int, ...]] = None,
    opacity_cull: bool = True,
) -> RenderOutput:
    """Render one view. Same contract as render_dense (rasterizer_ref.py).

    instance_cap/tier_caps override assign_tiles' emission-tier caps —
    pinhole cube faces see ~1/6 of the Gaussians, so the face renderer passes
    tighter caps to shrink every cap-proportional downstream cost.
    opacity_cull: tighten binning radii to the exact {alpha >= 1/255}
    footprint (ops/projection.py::_finalize) — output-identical, fewer
    instances emitted/sorted/composited."""
    if background is None:
        background = jnp.zeros((3,), means.dtype)
    if sh_degree is None:
        sh_degree = int(math.isqrt(harmonics.shape[-1]) - 1)

    cull_op = opacities if opacity_cull else None
    if camera_kind == "erp":
        proj = project_erp(means, covariances, c2w, image_shape, near,
                           opacities=cull_op)
        wrap_x = True
    elif camera_kind == "pinhole":
        assert intrinsics is not None
        proj = project_pinhole(means, covariances, c2w, intrinsics, image_shape,
                               near, opacities=cull_op)
        wrap_x = False
    else:
        raise ValueError(camera_kind)

    if harmonics.shape[-1] == 1:
        colors = harmonics[..., 0]
    else:
        colors = sh_colors(harmonics, means, c2w[:3, 3], sh_degree)

    assignment = assign_tiles(
        proj, image_shape, wrap_x,
        instance_cap=instance_cap, tier_caps=tier_caps,
    )
    # depth channel uses the transformed value; the sort stays on raw depth
    depth_vals = transform_depth(proj.depth, depth_mode, near, far)

    # pallas kernels re-center u per TILE, which cannot serve both sides of
    # the equirect seam when the whole width is one tile; fall back to the
    # jax compositor for such narrow debug renders (ADVICE r4 #3) instead of
    # letting composite_tiles_pallas raise
    if backend == "pallas" and wrap_x and assignment.num_tiles_x < 2:
        backend = "jax"

    if backend == "jax":
        rgb, alpha, dacc = composite_tiles_jax(
            assignment,
            proj.mean2d,
            proj.conic,
            colors,
            opacities,
            depth_vals,
            proj.radius,
            image_shape,
            background,
            wrap_x,
            max_per_tile=max_per_tile,
        )
    elif backend == "pallas":
        from .pallas.composite import composite_tiles_pallas

        rgb, alpha, dacc = composite_tiles_pallas(
            assignment,
            proj.mean2d,
            proj.conic,
            colors,
            opacities,
            depth_vals,
            proj.radius,
            image_shape,
            background,
            wrap_x,
        )
    else:
        raise ValueError(backend)

    return RenderOutput(
        color=rgb, depth=dacc if render_depth else None, alpha=alpha,
        dropped=assignment.dropped,
    )
