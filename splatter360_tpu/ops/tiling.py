"""Tile binning + depth sorting for the tiled rasterizer (static shapes, jit-friendly).

Replaces the CUDA rasterizer's duplicate-expand + radix-sort stage (tile binning, depth
sort — SURVEY.md §2.9) with an XLA design tuned around TPU primitive costs (sorts are
~4 ns/element; gathers/scatters ~10 ns/index; per-index ops dominate, so the pipeline
minimizes their count):

  * three-tier instance emission, sorted DIRECTLY (no scatter compaction):
      - fast tier: every Gaussian emits TWO slots — its home tile plus the single
        straddled neighbor (covers the ~91% of splats that cross at most one tile
        boundary; unused slots get a sentinel key);
      - irregular tier: 2x2-corner straddlers and narrow-tall splats (fits a
        MED_SPAN_W x MED_SPAN_H rect, ~8.6%) are compacted with a capped
        nonzero() and emit the medium rectangle;
      - big tier: the rare pole-stretched splats (~0.14%) emit a full
        SPAN_H x SPAN_W rectangle; overflow beyond either compacted tier's cap
        is counted in `dropped`.
  * one single-key sort: key = tile_id << 20 | depth_bits, where depth_bits are the
    top 20 bits of the positive-float32 depth (order-preserving; ~2^-11 relative
    depth resolution for ordering — ties break stably by emission order);
  * per-tile segments via a searchsorted with T+1 queries (queries are cheap; the
    many-query direction costs ~70 ns/query and is avoided everywhere).

Tiles are TILE_H x TILE_W = 16 x 128 pixels — lane-aligned and matched to the
horizontal anisotropy of pole-stretched ERP splats. The azimuth seam is handled by
emitting wrapped (modulo) tile columns, with spans clamped to the grid so a splat
never lands in the same tile twice.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import Projected

# Tile geometry is env-overridable (SPLAT360_TILE="16x64") for bench sweeps; the
# default is the measured-best shape on v5e. Pixel count per tile (TILE_H*TILE_W)
# sets the sublane extent of the compositing kernels; the instance chunk (BLOCK)
# stays 128 lanes regardless.
_tile_env = os.environ.get("SPLAT360_TILE")
if _tile_env:
    TILE_H, TILE_W = (int(x) for x in _tile_env.lower().split("x"))
else:
    TILE_H, TILE_W = 16, 128
BLOCK = 128  # instance chunk granularity (== pallas kernel CHUNK)
# Big-tier rectangles cover the same pixel extent regardless of tile shape:
# 512 px wide x 128 px tall (pole-stretched ERP splats).
SPAN_W = max(512 // TILE_W, 2)
SPAN_H = max(128 // TILE_H, 2)
# Irregular-tier rectangle (2 wide x up-to-4 tall tiles): catches the 2x2
# corner straddlers plus narrow-but-tall splats, so the per-Gaussian fast tier
# can stay at TWO slots. At the north-star load the split is ~91% fast-2 /
# ~8.6% irregular / ~0.14% big, which cuts sorted emission from 6.3N to 3.5N.
MED_SPAN_W = 2
MED_SPAN_H = min(4, SPAN_H)
_DEPTH_BITS = 20
# Plain Python int, NOT jnp.int32: a module-level jnp scalar would allocate on
# the default backend at import time (with the ambient axon TPU plugin that
# initializes the TPU tunnel before main() can pin jax_platforms=cpu).
_SENTINEL = 0x7FFFFFFF


class TileAssignment(NamedTuple):
    gaussian_idx: jnp.ndarray  # [K] int32 index into the Gaussian arrays, sorted
    tile_ids: jnp.ndarray      # [K] int32 tile of each sorted instance (>=T: invalid)
    tile_starts: jnp.ndarray   # [T] int32 start offset of each tile's segment
    tile_counts: jnp.ndarray   # [T] int32 number of instances per tile
    dropped: jnp.ndarray       # [] int32 big-tier instances lost to the cap
    num_tiles_x: int
    num_tiles_y: int
    # Emission-slot bookkeeping for the unfused pack gather's fast transpose
    # (see ops/pallas/composite.py::_gather_rows): slot s of each sorted
    # instance in the PRE-SORT emission layout ([N, 2] fast tier, then
    # [n_irr, MED_SPAN] irregular tier, then [n_big, SPAN] big tier), and the
    # compacted per-tier Gaussian indices (-1 = empty slot). Only carried when
    # `with_slots=True` — the production fused path (_render_core) never reads
    # them, and dropping the third sort operand saves a third of the sort.
    slot_ids: Optional[jnp.ndarray]  # [K] int32 emission slot, or None
    irr_idx: jnp.ndarray       # [n_irr] int32 Gaussian index of each irr slot
    big_idx: jnp.ndarray       # [n_big] int32 Gaussian index of each big slot


def num_tiles(image_shape: tuple[int, int]) -> tuple[int, int]:
    h, w = image_shape
    return -(-h // TILE_H), -(-w // TILE_W)


def _depth_key(depth: jnp.ndarray) -> jnp.ndarray:
    """Top _DEPTH_BITS of the f32 bit pattern — order-preserving for depth > 0."""
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    return jax.lax.shift_right_logical(bits, 32 - 1 - _DEPTH_BITS)


def _tile_rect_keys(
    tx0, ty0, span_x, span_y, qd, valid, ntx, nty, sh, sw, wrap_x,
    u, v, rx, ry, w_img,
):
    """Emit keys for an sh x sw tile rectangle. Returns [N, sh, sw] int32 keys.

    Each slot is additionally culled by the exact counterpart of the
    compositor's |dx| <= rx, |dy| <= ry gate: a slot whose tile box of
    PIXEL CENTERS lies entirely outside the splat's radius box can never
    receive a contribution, so it is never emitted. For small splats this
    kills 2-3 of the 4 fast-tier slots, which shrinks every downstream
    per-instance cost (sort survivors, pack gather, kernel blocks, gradient
    scatter). Under wrap the test re-centers u modulo the image width to the
    WRAPPED tile box, mirroring the kernel (clamped spans can wrap a slot far
    from its unwrapped position)."""
    sy = jnp.arange(sh, dtype=jnp.int32)
    sx = jnp.arange(sw, dtype=jnp.int32)
    tile_x = tx0[:, None] + sx[None, :]
    tile_y = ty0[:, None] + sy[None, :]
    if wrap_x:
        tile_x = jnp.mod(tile_x, ntx)
    x_lo = (tile_x * TILE_W).astype(u.dtype)            # [N, sw]
    y_lo = (tile_y * TILE_H).astype(v.dtype)            # [N, sh]
    if wrap_x:
        # Same re-centering expression as the compositor kernels (x0 + TILE_W/2,
        # ops/pallas/composite.py::_chunk_alpha) so cull and composite agree on the
        # wrap image bit-for-bit.
        xc = x_lo + TILE_W * 0.5
        u_eff = u[:, None] + w_img * jnp.round((xc - u[:, None]) / w_img)
    else:
        u_eff = u[:, None]
    dx = jnp.maximum(
        jnp.maximum(x_lo - u_eff, u_eff - (x_lo + TILE_W - 1)), 0.0
    )
    dy = jnp.maximum(
        jnp.maximum(y_lo - v[:, None], v[:, None] - (y_lo + TILE_H - 1)), 0.0
    )
    hit = (dy[:, :, None] <= ry[:, None, None]) & (dx[:, None, :] <= rx[:, None, None])
    tile_id = tile_y[:, :, None] * ntx + tile_x[:, None, :]
    ok = (
        (sy[None, :, None] < span_y[:, None, None])
        & (sx[None, None, :] < span_x[:, None, None])
        & valid[:, None, None]
        & hit
    )
    key = jax.lax.shift_left(tile_id, _DEPTH_BITS) | qd[:, None, None]
    return jnp.where(ok, key, _SENTINEL)


def assign_tiles(
    proj: Projected,
    image_shape: tuple[int, int],
    wrap_x: bool,
    big_cap: Optional[int] = None,
    instance_cap: Optional[int] = None,
    with_slots: bool = False,
    irr_cap: Optional[int] = None,
) -> TileAssignment:
    nty, ntx = num_tiles(image_shape)
    _, w = image_shape
    t_total = ntx * nty
    # key = tile_id << _DEPTH_BITS | depth must stay positive in int32
    assert t_total < (1 << (31 - _DEPTH_BITS)), (
        f"{t_total} tiles overflow the sort key; use larger tiles"
    )
    n = proj.mean2d.shape[0]
    # Tier caps leave generous headroom over the measured north-star split
    # (~8.6% irregular, ~0.14% big); overflow is counted in `dropped`, and the
    # floors keep small scenes (tests) uncapped. Big splats are the largest on
    # screen — dropping them is the most visible possible truncation.
    n_irr = irr_cap if irr_cap is not None else max(n // 8, 4096)
    n_big = big_cap if big_cap is not None else max(n // 64, 1024)
    # Post-sort truncation cap: real instances sort before sentinels, so keeping the
    # first `cap` entries only drops work when the real count exceeds it (counted in
    # `dropped`). This bounds every downstream per-index cost (pack gather, kernel
    # blocks, gradient scatter-add). 2N leaves ~27% headroom over the measured
    # 1.62N real instances at the north-star load (exact per-slot culling).
    cap = instance_cap if instance_cap is not None else max(2 * n, 4096)
    cap = -(-cap // BLOCK) * BLOCK

    u = proj.mean2d[:, 0]
    v = proj.mean2d[:, 1]
    rx = proj.radius[:, 0]
    ry = proj.radius[:, 1]
    qd = _depth_key(jnp.maximum(proj.depth, 1e-9))

    tx0 = jnp.floor((u - rx) / TILE_W).astype(jnp.int32)
    tx1 = jnp.floor((u + rx) / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor((v - ry) / TILE_H).astype(jnp.int32)
    ty1 = jnp.floor((v + ry) / TILE_H).astype(jnp.int32)
    if not wrap_x:
        tx0 = jnp.clip(tx0, 0, ntx - 1)
        tx1 = jnp.clip(tx1, 0, ntx - 1)
    ty0 = jnp.clip(ty0, 0, nty - 1)
    ty1 = jnp.clip(ty1, 0, nty - 1)
    # Clamp spans to the grid size (wrap would otherwise duplicate tiles).
    span_x = jnp.minimum(jnp.minimum(tx1 - tx0 + 1, SPAN_W), ntx)
    span_y = jnp.minimum(jnp.minimum(ty1 - ty0 + 1, SPAN_H), nty)

    # Tier split: 2-slot fast tier for splats spanning at most 2 tiles along
    # ONE axis (~91% at the north-star load); 2xMED_SPAN_H irregular tier for
    # corner (2x2) straddlers and narrow-tall splats; full-rectangle big tier
    # for the rest. Keeps sorted emission at ~3.5N instead of 4 slots for all.
    is_corner = (span_x == 2) & (span_y == 2)
    is_fast = proj.valid & (span_x <= 2) & (span_y <= 2) & ~is_corner
    fits_med = (span_x <= MED_SPAN_W) & (span_y <= MED_SPAN_H)
    irr_mask = proj.valid & ~is_fast & fits_med
    big_mask = proj.valid & ~is_fast & ~fits_med

    # fast tier, slot 0: the top-left tile of the (clamped) rect.
    keys_f0 = _tile_rect_keys(
        tx0, ty0, span_x, span_y, qd, is_fast, ntx, nty, 1, 1, wrap_x,
        u, v, rx, ry, float(w),
    ).reshape(-1)
    # fast tier, slot 1: the single straddled neighbor (down if span_y == 2,
    # else right if span_x == 2; sentinel for 1x1 splats).
    down = span_y == 2
    tx_s1 = jnp.where(down, tx0, tx0 + 1)
    ty_s1 = jnp.where(down, ty0 + 1, ty0)
    has_s1 = is_fast & ((span_x == 2) | (span_y == 2))
    keys_f1 = _tile_rect_keys(
        tx_s1, ty_s1, jnp.ones_like(span_x), jnp.ones_like(span_y), qd,
        has_s1, ntx, nty, 1, 1, wrap_x, u, v, rx, ry, float(w),
    ).reshape(-1)
    keys_fast = jnp.stack([keys_f0, keys_f1], axis=1).reshape(-1)
    gidx_fast = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, 2)
    ).reshape(-1)

    # irregular tier: compact, then emit the 2 x MED_SPAN_H rectangle
    (irr_idx,) = jnp.nonzero(irr_mask, size=n_irr, fill_value=-1)
    irr_ok = irr_idx >= 0
    ii = jnp.clip(irr_idx, 0, n - 1)
    keys_irr = _tile_rect_keys(
        tx0[ii], ty0[ii], span_x[ii], span_y[ii], qd[ii], irr_ok,
        ntx, nty, MED_SPAN_H, MED_SPAN_W, wrap_x, u[ii], v[ii], rx[ii],
        ry[ii], float(w),
    ).reshape(-1)
    gidx_irr = jnp.broadcast_to(
        ii[:, None], (n_irr, MED_SPAN_H * MED_SPAN_W)
    ).reshape(-1)

    # big tier: compact the big subset, then emit the full rectangle
    (big_idx,) = jnp.nonzero(big_mask, size=n_big, fill_value=-1)
    big_ok = big_idx >= 0
    bi = jnp.clip(big_idx, 0, n - 1)
    keys_big = _tile_rect_keys(
        tx0[bi], ty0[bi], span_x[bi], span_y[bi], qd[bi], big_ok,
        ntx, nty, SPAN_H, SPAN_W, wrap_x, u[bi], v[bi], rx[bi], ry[bi],
        float(w),
    ).reshape(-1)
    gidx_big = jnp.broadcast_to(
        bi[:, None], (n_big, SPAN_H * SPAN_W)
    ).reshape(-1)
    dropped = (
        jnp.maximum(jnp.sum(irr_mask) - jnp.sum(irr_ok), 0)
        + jnp.maximum(jnp.sum(big_mask) - jnp.sum(big_ok), 0)
    )

    keys = jnp.concatenate([keys_fast, keys_irr, keys_big])
    gidx = jnp.concatenate([gidx_fast, gidx_irr, gidx_big])
    # pad K to a block multiple for the kernel's block-granular DMA
    k = keys.shape[0]
    k_pad = -(-k // BLOCK) * BLOCK
    keys = jnp.pad(keys, (0, k_pad - k), constant_values=_SENTINEL)
    gidx = jnp.pad(gidx, (0, k_pad - k))
    if with_slots:
        # Emission order IS slot order, so the slot array is just iota; carrying
        # it through the sort gives the permutation that inverts the unfused
        # pack gather (_gather_rows).
        slot = jnp.arange(k_pad, dtype=jnp.int32)
        keys_sorted, gidx_sorted, slot_sorted = jax.lax.sort(
            (keys, gidx, slot), num_keys=1
        )
    else:
        keys_sorted, gidx_sorted = jax.lax.sort((keys, gidx), num_keys=1)
        slot_sorted = None
    if cap < k_pad:
        n_real = jnp.sum((keys_sorted[cap:] != _SENTINEL).astype(jnp.int32))
        dropped = dropped + n_real
        keys_sorted = keys_sorted[:cap]
        gidx_sorted = gidx_sorted[:cap]
        if slot_sorted is not None:
            slot_sorted = slot_sorted[:cap]
    tile_ids = jax.lax.shift_right_logical(keys_sorted, _DEPTH_BITS)

    bounds = jnp.arange(t_total + 1, dtype=jnp.int32) << _DEPTH_BITS
    edges = jnp.searchsorted(keys_sorted, bounds)  # T+1 queries: cheap
    edges = jnp.minimum(edges, keys_sorted.shape[0])
    return TileAssignment(
        gaussian_idx=gidx_sorted,
        tile_ids=tile_ids.astype(jnp.int32),
        tile_starts=edges[:-1].astype(jnp.int32),
        tile_counts=(edges[1:] - edges[:-1]).astype(jnp.int32),
        dropped=dropped.astype(jnp.int32),
        num_tiles_x=ntx,
        num_tiles_y=nty,
        slot_ids=slot_sorted,
        irr_idx=irr_idx.astype(jnp.int32),
        big_idx=big_idx.astype(jnp.int32),
    )
