"""DecoderSplatting: Gaussians + target cameras -> rendered views.

Capability parity with DecoderSplattingCUDA
(/root/reference/src/model/decoder/decoder_splatting_cuda.py:19-97), TPU-first:
  * "erp" mode renders target panoramas DIRECTLY with the equirect rasterizer (the
    reference can only render 6 pinhole faces and stitch, because its CUDA kernel is
    pinhole-only; BASELINE.json names direct equirect projection the fast path);
  * "cubes" mode renders the v*6 cube faces (FRBLUD) for cube-supervision parity with
    the reference's training losses;
  * batched with vmap over (batch, view[, face]) instead of the reference's per-face
    Python loops (decoder_splatting_cuda.py:47, cuda_splatting.py:91).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.cubemap import cube_face_extrinsics, cube_face_intrinsics
from ..ops.rasterizer import render_tiled
from .types import Gaussians


class DecoderOutput(NamedTuple):
    color: jnp.ndarray           # [B, V, H, W, 3] or [B, V, 6, Hc, Wc, 3]
    depth: Optional[jnp.ndarray] # matching spatial shape or None
    alpha: Optional[jnp.ndarray]
    # [B, V] / [B, V, 6] int32 — splats lost to emission-cap overflow per
    # rendered view/face (assign_tiles' `dropped`; nonzero = degraded image)
    dropped: Optional[jnp.ndarray] = None


def render_erp_views(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,  # [B, V, 4, 4] target ERP c2w
    near: jnp.ndarray,        # [B, V]
    far: jnp.ndarray,         # [B, V]
    image_shape: tuple[int, int],
    background: Optional[jnp.ndarray] = None,
    render_depth: bool = False,
    depth_mode: str = "depth",
    backend: str = "pallas",
    max_per_tile: int = 2048,
) -> DecoderOutput:
    b, v = extrinsics.shape[0], extrinsics.shape[1]
    if background is None:
        background = jnp.zeros((3,), extrinsics.dtype)

    def one(means, covs, sh, op, c2w, nr, fr):
        out = render_tiled(
            means, covs, sh, op, c2w, image_shape,
            camera_kind="erp", near=nr, far=fr, background=background,
            render_depth=render_depth, depth_mode=depth_mode, backend=backend,
            max_per_tile=max_per_tile,
        )
        return (out.color, (out.depth if render_depth else jnp.zeros((0,))),
                out.alpha, out.dropped)

    # vmap over views then batch (gaussians shared across views within a batch item)
    per_view = jax.vmap(one, in_axes=(None, None, None, None, 0, 0, 0))
    per_batch = jax.vmap(per_view, in_axes=(0, 0, 0, 0, 0, 0, 0))
    color, depth, alpha, dropped = per_batch(
        gaussians.means, gaussians.covariances, gaussians.harmonics,
        gaussians.opacities, extrinsics, near, far,
    )
    return DecoderOutput(
        color=color,
        depth=depth if render_depth else None,
        alpha=alpha,
        dropped=dropped,
    )


def render_cube_views(
    gaussians: Gaussians,
    extrinsics_sphere: jnp.ndarray,  # [B, V, 4, 4] target ERP poses
    near: jnp.ndarray,               # [B, V]
    far: jnp.ndarray,                # [B, V]
    face_shape: tuple[int, int],
    background: Optional[jnp.ndarray] = None,
    render_depth: bool = False,
    depth_mode: str = "depth",
    backend: str = "pallas",
    max_per_tile: int = 2048,
    sequential: "bool | str" = False,
    remat_faces: bool = True,
) -> DecoderOutput:
    """Render the 6 cube faces (FRBLUD) of every target view.

    sequential=True renders the v*6 faces of each batch item under lax.map
    instead of vmap; sequential="unroll" emits a Python-unrolled face loop
    (see the branch comment). vmap materializes every face's intermediate buffers AT
    ONCE — at hm3d scale (1.05M gaussians, 12 faces) the per-face instance
    packs / attr-cotangent tables alone are >10 GB of HBM temp and the train
    step cannot fit on a 16 GB chip; lax.map reuses one face's buffers across
    the loop (only the O(cap) pack residuals stack). Each face render is a
    ~0.3M-instance workload — big enough to keep the chip busy, so the
    serialization costs little (the reference also loops faces,
    decoder_splatting_cuda.py:47)."""
    b, v = extrinsics_sphere.shape[0], extrinsics_sphere.shape[1]
    faces_c2w = cube_face_extrinsics(extrinsics_sphere)  # [B, V, 6, 4, 4]
    intr = cube_face_intrinsics(extrinsics_sphere.dtype)
    if background is None:
        background = jnp.zeros((3,), extrinsics_sphere.dtype)

    n = gaussians.means.shape[-2]

    def one(means, covs, sh, op, c2w, nr, fr):
        # a 90-degree face sees ~1/6 of the splats (~0.3N instances measured at
        # the north-star load): cap each face's emission tiers at N-level
        # headroom instead of the panoramic defaults (2N), shrinking the pack /
        # kernel-block / gradient-scatter capacities 2x per face. Overflow is
        # counted in assignment.dropped (real instances sort before sentinels).
        out = render_tiled(
            means, covs, sh, op, c2w, face_shape,
            camera_kind="pinhole", intrinsics=intr, near=nr, far=fr,
            background=background, render_depth=render_depth,
            depth_mode=depth_mode, backend=backend,
            max_per_tile=max_per_tile,
            instance_cap=max(n, 4096),
        )
        return (out.color, (out.depth if render_depth else jnp.zeros((0,))),
                out.alpha, out.dropped)

    if sequential == "unroll":
        # UNROLLED faces: a Python loop over the v*6 renders inside one
        # trace. Unlike lax.map (whose scan serializes iterations — XLA
        # cannot overlap face i+1's binning with face i's compositing), the
        # unrolled graph lets the scheduler interleave stages across faces
        # and share loop-invariant work. Costs compile time (12x the face
        # graph) and lets XLA decide residual liveness; pair with
        # remat_faces to bound memory.
        one_r = jax.checkpoint(one) if remat_faces else one

        def per_item(means, covs, sh, op, c2ws, nr, fr):
            vf = v * 6
            c2ws_f = c2ws.reshape(vf, 4, 4)
            nr_f = jnp.repeat(nr, 6)
            fr_f = jnp.repeat(fr, 6)
            outs = [
                one_r(means, covs, sh, op, c2ws_f[i], nr_f[i], fr_f[i])
                for i in range(vf)
            ]
            color, depth, alpha, dropped = (
                jnp.stack([o[k] for o in outs]) for k in range(4)
            )
            return (
                color.reshape(v, 6, *color.shape[1:]),
                depth.reshape(v, 6, *depth.shape[1:]),
                alpha.reshape(v, 6, *alpha.shape[1:]),
                dropped.reshape(v, 6),
            )

        per_batch = jax.vmap(per_item, in_axes=(0, 0, 0, 0, 0, 0, 0))
    elif sequential:
        # remat the per-face render: without it lax.map STACKS each face's
        # pallas residuals (packed instance blocks, SH bases — measured
        # 1.5G + 0.77G at hm3d scale) across all 12 iterations; with it the
        # map saves only (c2w, near, far) per face and replays the face
        # forward during backward (~1 extra decoder forward total).
        # remat_faces=False trades that replay time back for the stacked
        # residual memory when the chip has headroom.
        one_r = jax.checkpoint(one) if remat_faces else one

        def per_item(means, covs, sh, op, c2ws, nr, fr):
            vf = v * 6
            c2ws_f = c2ws.reshape(vf, 4, 4)
            nr_f = jnp.repeat(nr, 6)
            fr_f = jnp.repeat(fr, 6)
            color, depth, alpha, dropped = jax.lax.map(
                lambda a: one_r(means, covs, sh, op, a[0], a[1], a[2]),
                (c2ws_f, nr_f, fr_f),
            )
            return (
                color.reshape(v, 6, *color.shape[1:]),
                depth.reshape(v, 6, *depth.shape[1:]),
                alpha.reshape(v, 6, *alpha.shape[1:]),
                dropped.reshape(v, 6),
            )

        per_batch = jax.vmap(per_item, in_axes=(0, 0, 0, 0, 0, 0, 0))
    else:
        per_face = jax.vmap(
            one, in_axes=(None, None, None, None, 0, None, None)
        )
        per_view = jax.vmap(
            per_face, in_axes=(None, None, None, None, 0, 0, 0)
        )
        per_batch = jax.vmap(per_view, in_axes=(0, 0, 0, 0, 0, 0, 0))
    color, depth, alpha, dropped = per_batch(
        gaussians.means, gaussians.covariances, gaussians.harmonics,
        gaussians.opacities, faces_c2w, near, far,
    )
    return DecoderOutput(
        color=color,
        depth=depth if render_depth else None,
        alpha=alpha,
        dropped=dropped,
    )


class DecoderSplatting:
    """Thin functional namespace mirroring the reference Decoder interface."""

    erp = staticmethod(render_erp_views)
    cubes = staticmethod(render_cube_views)
