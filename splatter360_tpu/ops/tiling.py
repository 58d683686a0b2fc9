"""Tile binning + depth sorting for the tiled rasterizer (static shapes, jit-friendly).

Replaces the CUDA rasterizer's duplicate-expand + radix-sort stage (tile binning, depth
sort — SURVEY.md §2.9) with an XLA design:
  * every Gaussian emits up to MAX_TILES_PER_GAUSSIAN = SPAN_W x SPAN_H instances into a
    fixed-capacity buffer (invalid slots get a sentinel tile id that sorts last);
  * one lexicographic `lax.sort` over (tile_id, depth) orders instances front-to-back
    within each tile;
  * per-tile segment offsets come from a searchsorted over the sorted tile ids.

Tiles are TILE_H x TILE_W = 16 x 128 pixels — lane-aligned (last dim 128) and matched to
the horizontal anisotropy of pole-stretched ERP splats. The azimuth seam is handled by
emitting wrapped tile columns (modulo) so splats crossing u = 0/W land in both edge
tiles; the compositing kernel evaluates wrapped pixel deltas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected

TILE_H = 16
TILE_W = 128
SPAN_W = 4  # max tiles covered horizontally (4 * 128 = 512 px)
SPAN_H = 8  # max tiles covered vertically   (8 * 16  = 128 px)


class TileAssignment(NamedTuple):
    gaussian_idx: jnp.ndarray  # [K] int32 index into the Gaussian arrays, sorted
    tile_starts: jnp.ndarray   # [T] int32 start offset of each tile's segment
    tile_counts: jnp.ndarray   # [T] int32 number of instances per tile
    num_tiles_x: int
    num_tiles_y: int


def num_tiles(image_shape: tuple[int, int]) -> tuple[int, int]:
    h, w = image_shape
    return -(-h // TILE_H), -(-w // TILE_W)


def assign_tiles(
    proj: Projected, image_shape: tuple[int, int], wrap_x: bool
) -> TileAssignment:
    h, w = image_shape
    ntx, nty = num_tiles(image_shape)[1], num_tiles(image_shape)[0]
    t_total = ntx * nty
    n = proj.mean2d.shape[0]

    u = proj.mean2d[:, 0]
    v = proj.mean2d[:, 1]
    r = proj.radius

    tx0 = jnp.floor((u - r) / TILE_W).astype(jnp.int32)
    tx1 = jnp.floor((u + r) / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor((v - r) / TILE_H).astype(jnp.int32)
    ty1 = jnp.floor((v + r) / TILE_H).astype(jnp.int32)
    if not wrap_x:
        tx0 = jnp.clip(tx0, 0, ntx - 1)
        tx1 = jnp.clip(tx1, 0, ntx - 1)
    ty0 = jnp.clip(ty0, 0, nty - 1)
    ty1 = jnp.clip(ty1, 0, nty - 1)
    # Clamp spans to the grid size: with azimuth wrap a span covering >= ntx tiles
    # would otherwise emit duplicate instances into the same (modulo) tile.
    span_x = jnp.minimum(jnp.minimum(tx1 - tx0 + 1, SPAN_W), ntx)
    span_y = jnp.minimum(jnp.minimum(ty1 - ty0 + 1, SPAN_H), nty)

    # Enumerate the (SPAN_H, SPAN_W) static rectangle of candidate tiles per Gaussian.
    sx = jnp.arange(SPAN_W, dtype=jnp.int32)
    sy = jnp.arange(SPAN_H, dtype=jnp.int32)
    tile_x = tx0[:, None] + sx[None, :]  # [N, SPAN_W]
    tile_y = ty0[:, None] + sy[None, :]  # [N, SPAN_H]
    if wrap_x:
        tile_x = jnp.mod(tile_x, ntx)
    ok_x = sx[None, :] < span_x[:, None]
    ok_y = sy[None, :] < span_y[:, None]
    tile_id = (
        tile_y[:, :, None] * ntx + tile_x[:, None, :]
    )  # [N, SPAN_H, SPAN_W]
    ok = (ok_y[:, :, None] & ok_x[:, None, :]) & proj.valid[:, None, None]
    tile_id = jnp.where(ok, tile_id, t_total)  # sentinel sorts last

    k = n * SPAN_H * SPAN_W
    tile_id = tile_id.reshape(k)
    depth = jnp.broadcast_to(
        proj.depth[:, None, None], (n, SPAN_H, SPAN_W)
    ).reshape(k)
    gidx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, SPAN_H, SPAN_W)
    ).reshape(k)

    tile_sorted, _, gidx_sorted = jax.lax.sort(
        (tile_id, depth, gidx), num_keys=2
    )
    starts = jnp.searchsorted(tile_sorted, jnp.arange(t_total, dtype=tile_sorted.dtype))
    ends = jnp.searchsorted(
        tile_sorted, jnp.arange(1, t_total + 1, dtype=tile_sorted.dtype)
    )
    return TileAssignment(
        gaussian_idx=gidx_sorted,
        tile_starts=starts.astype(jnp.int32),
        tile_counts=(ends - starts).astype(jnp.int32),
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )
