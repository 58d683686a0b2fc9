"""Pure-JAX tile compositor (fallback + test oracle for the Pallas kernel).

Semantics are the CUDA forward's, identically to composite_dense (rasterizer_ref.py):
alpha floor 1/255, 0.99 cap, per-pixel early termination at T < 1e-4 where the
crossing Gaussian is skipped and T freezes. Differentiable via autograd (scan).

Each tile processes a static `max_per_tile` slice of its sorted instance segment
(padded/truncated), vmapped over tiles; the Pallas path has no such cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tiling import TILE_H, TILE_W, TileAssignment


def composite_tiles_jax(
    assignment: TileAssignment,
    mean2d: jnp.ndarray,    # [N, 2]
    conic: jnp.ndarray,     # [N, 3]
    colors: jnp.ndarray,    # [N, C]
    opacities: jnp.ndarray, # [N]
    depths: jnp.ndarray,    # [N]
    radii: jnp.ndarray,     # [N, 2] per-axis (rx, ry)
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    wrap_x: bool,
    max_per_tile: int = 512,
):
    """Returns (image [H, W, C], alpha [H, W], depth [H, W])."""
    h, w = image_shape
    ntx, nty = assignment.num_tiles_x, assignment.num_tiles_y
    c = colors.shape[-1]
    k = assignment.gaussian_idx.shape[0]

    slot = jnp.arange(max_per_tile, dtype=jnp.int32)
    seg = assignment.tile_starts[:, None] + slot[None, :]  # [T, M]
    in_seg = slot[None, :] < assignment.tile_counts[:, None]
    gi = jnp.where(in_seg, assignment.gaussian_idx[jnp.clip(seg, 0, k - 1)], 0)

    g_mean = mean2d[gi]                      # [T, M, 2]
    g_conic = conic[gi]                      # [T, M, 3]
    g_color = colors[gi]                     # [T, M, C]
    g_op = jnp.where(in_seg, opacities[gi], 0.0)  # [T, M]
    g_depth = depths[gi]                     # [T, M]
    g_rad = radii[gi]                        # [T, M]

    tid = jnp.arange(ntx * nty, dtype=jnp.int32)
    tile_x0 = (tid % ntx) * TILE_W
    tile_y0 = (tid // ntx) * TILE_H
    px = jnp.arange(TILE_W, dtype=mean2d.dtype)
    py = jnp.arange(TILE_H, dtype=mean2d.dtype)
    xx, yy = jnp.meshgrid(px, py, indexing="xy")  # [TH, TW]

    def tile_fn(x0, y0, means, conics, cols, ops, deps, rads):
        gx = xx + x0
        gy = yy + y0

        def step(carry, g):
            rgb, trans, dacc = carry
            m, cn, cl, o, d, r = g
            dx = gx - m[0]
            if wrap_x:
                dx = dx - w * jnp.round(dx / w)
            dy = gy - m[1]
            power = -0.5 * (cn[0] * dx * dx + cn[2] * dy * dy) - cn[1] * dx * dy
            alpha = jnp.minimum(0.99, o * jnp.exp(power))
            inside = (jnp.abs(dx) <= r[0]) & (jnp.abs(dy) <= r[1])
            alpha = jnp.where(
                inside & (power > -4.5) & (power <= 0.0) & (alpha >= 1.0 / 255.0),
                alpha, 0.0
            )
            # unmasked T decay + post-decay contribution gate (see rasterizer_ref)
            trans_new = trans * (1.0 - alpha)
            weight = jnp.where(trans_new >= 1e-4, alpha * trans, 0.0)
            rgb = rgb + weight[..., None] * cl
            dacc = dacc + weight * d
            trans = trans_new
            return (rgb, trans, dacc), None

        init = (
            jnp.zeros((TILE_H, TILE_W, c), cols.dtype),
            jnp.ones((TILE_H, TILE_W), cols.dtype),
            jnp.zeros((TILE_H, TILE_W), cols.dtype),
        )
        (rgb, trans, dacc), _ = jax.lax.scan(
            step, init, (means, conics, cols, ops, deps, rads)
        )
        return rgb, trans, dacc

    rgb, trans, dacc = jax.vmap(tile_fn)(
        tile_x0.astype(mean2d.dtype),
        tile_y0.astype(mean2d.dtype),
        g_mean,
        g_conic,
        g_color,
        g_op,
        g_depth,
        g_rad,
    )
    # [T, TH, TW, C] -> [H_pad, W_pad, C] -> crop
    rgb = rgb.reshape(nty, ntx, TILE_H, TILE_W, c)
    rgb = rgb.transpose(0, 2, 1, 3, 4).reshape(nty * TILE_H, ntx * TILE_W, c)
    trans = trans.reshape(nty, ntx, TILE_H, TILE_W)
    trans = trans.transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * TILE_W)
    dacc = dacc.reshape(nty, ntx, TILE_H, TILE_W)
    dacc = dacc.transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * TILE_W)

    rgb = rgb[:h, :w] + trans[:h, :w, None] * background
    return rgb, 1.0 - trans[:h, :w], dacc[:h, :w]
