"""Tile binning + depth sorting for the tiled rasterizer (static shapes, jit-friendly).

Replaces the CUDA rasterizer's duplicate-expand + radix-sort stage (tile binning, depth
sort — SURVEY.md §2.9) with an XLA design tuned around measured TPU primitive costs
(v5e, 3.67M-key load): 2-op sort 10.9 ms, 1-op sort-compaction 3.6 ms,
`jnp.nonzero(size=)` 12.2 ms, `searchsorted` with T+1 queries 2.5 ms; per-index
scatters ~10 ns/index. Sorts are the cheapest bulk reorder, so everything that was a
scatter/compaction in round 1 is a sort here:

  * four-tier instance emission, sorted DIRECTLY (no scatter compaction):
      - fast tier: every Gaussian emits TWO slots — its home tile plus the single
        straddled neighbor (covers splats crossing at most one tile boundary);
      - corner tier (2x2), tall tier (MED_SPAN_W x MED_SPAN_H), and big tier
        (SPAN_W x SPAN_H pole-stretched rects) are compacted together by ONE
        single-operand sort of a (tier, index) key; each tier's window is read
        with a dynamic_slice at the running tier count. Overflow beyond any
        tier cap is counted in `dropped`.
  * one single-key sort: key = tile_id << 20 | depth_bits, where depth_bits are the
    top 20 bits of the positive-float32 depth (order-preserving; ~2^-11 relative
    depth resolution for ordering — ties break stably by emission order);
  * per-tile segments via a fused one-hot histogram over the sorted tile ids
    (compare+reduce streams at VPU rate; measured ~4x cheaper than the
    searchsorted it replaces) followed by an exclusive cumsum over T tiles.

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
# Tall-tier rectangle (2 wide x up-to-4 tall tiles): narrow-but-tall splats.
MED_SPAN_W = 2
MED_SPAN_H = min(4, SPAN_H)
# Compacted emission tiers, emitted after the [N, 2] fast tier in this order:
# (span_h, span_w, cap_divisor, cap_floor). Caps are n // divisor (>= floor);
# any overflow is counted in `dropped` (surfaced through render outputs).
# Measured at the north-star load (1.05M gaussians, 512x1024 erp): corner
# 46.3k, tall 43.4k, big 1.5k -> n/16 caps give ~1.5x headroom (the original
# n/32 tall cap OVERFLOWED there, silently dropping ~10.7k splats).
COMPACT_TIERS = (
    (2, 2, 16, 2048),                 # corner: 2x2 straddlers
    (MED_SPAN_H, MED_SPAN_W, 16, 1024),  # tall: span_y in 3..MED_SPAN_H, narrow
    (SPAN_H, SPAN_W, 256, 1024),      # big: the rare pole-stretched splats
)
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
    dropped: jnp.ndarray       # [] int32 instances lost to tier/instance caps
    num_tiles_x: int
    num_tiles_y: int
    # Emission-slot bookkeeping for the unfused pack gather's fast transpose
    # (see ops/pallas/composite.py::_gather_rows): slot s of each sorted
    # instance in the PRE-SORT emission layout ([N, 2] fast tier, then one
    # [cap_i, span_i] block per COMPACT_TIERS entry), and the compacted
    # per-tier Gaussian indices (-1 = empty slot). Only carried when
    # `with_slots=True` — the production fused path (_render_core) never reads
    # them, and dropping the third sort operand saves a third of the sort.
    slot_ids: Optional[jnp.ndarray]  # [K] int32 emission slot, or None
    tier_idx: tuple                  # len(COMPACT_TIERS) arrays [cap_i] int32


def num_tiles(image_shape: tuple[int, int]) -> tuple[int, int]:
    h, w = image_shape
    return -(-h // TILE_H), -(-w // TILE_W)


def _depth_key(depth: jnp.ndarray) -> jnp.ndarray:
    """Top _DEPTH_BITS of the f32 bit pattern — order-preserving for depth > 0."""
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    return jax.lax.shift_right_logical(bits, 32 - 1 - _DEPTH_BITS)


def _tile_rect_keys(
    tx0, ty0, span_x, span_y, qd, valid, ntx, nty, sh, sw, wrap_x,
    u, v, rx, ry, w_img, conic_s=None,
):
    """Emit keys for an sh x sw tile rectangle. Returns [sh, sw, C] int32 keys.

    The splat index C stays on the LANE (last) dimension throughout — a
    [C, sh, sw] layout would run every op at sh*sw/128 lane utilization
    (measured ~6 ms of pure lane waste per binning at the north-star load).

    Each slot is additionally culled by the exact counterpart of the
    compositor's |dx| <= rx, |dy| <= ry gate: a slot whose tile box of
    PIXEL CENTERS lies entirely outside the splat's radius box can never
    receive a contribution, so it is never emitted. For small splats this
    kills 2-3 of the 4 fast-tier slots, which shrinks every downstream
    per-instance cost (sort survivors, pack gather, kernel blocks, gradient
    scatter). Under wrap the test re-centers u modulo the image width to the
    WRAPPED tile box, mirroring the kernel (clamped spans can wrap a slot far
    from its unwrapped position).

    conic_s = (ca, cb, cc, gate_s), each [C], adds the ELLIPTICAL cull (r4):
    the AABB keeps corner tiles the gate ellipse {x^T Q x < gate_s} never
    reaches. The EXACT min of the convex quadratic over the tile rect is
    min of the two clamped edge-stationary candidates (fix x at the nearest
    x-edge, minimize over y clamped; and vice versa — the interior case
    degenerates to 0 through the clamps). min > gate_s => every pixel's
    compositor gate is already zero, so the skip is output-identical; it
    kills the diagonal corners of stretched splats' rectangles."""
    sy = jnp.arange(sh, dtype=jnp.int32)[:, None, None]   # [sh, 1, 1]
    sx = jnp.arange(sw, dtype=jnp.int32)[None, :, None]   # [1, sw, 1]
    tile_x = tx0[None, None, :] + sx                      # [1, sw, C]
    tile_y = ty0[None, None, :] + sy                      # [sh, 1, C]
    if wrap_x:
        tile_x = jnp.mod(tile_x, ntx)
    x_lo = (tile_x * TILE_W).astype(u.dtype)
    y_lo = (tile_y * TILE_H).astype(v.dtype)
    if wrap_x:
        # Same re-centering expression as the compositor kernels (x0 + TILE_W/2,
        # ops/pallas/composite.py::_chunk_alpha) so cull and composite agree on the
        # wrap image bit-for-bit.
        xc = x_lo + TILE_W * 0.5
        u_eff = u[None, None, :] + w_img * jnp.round((xc - u[None, None, :]) / w_img)
    else:
        u_eff = u[None, None, :]
    dx = jnp.maximum(
        jnp.maximum(x_lo - u_eff, u_eff - (x_lo + TILE_W - 1)), 0.0
    )
    dy = jnp.maximum(
        jnp.maximum(y_lo - v[None, None, :], v[None, None, :] - (y_lo + TILE_H - 1)),
        0.0,
    )
    hit = (dy <= ry[None, None, :]) & (dx <= rx[None, None, :])
    if conic_s is not None:
        ca, cb, cc, gate_s = (x[None, None, :] for x in conic_s)
        # signed nearest-point ranges of the tile's pixel box around the mean
        dx0 = x_lo - u_eff
        dx1 = x_lo + (TILE_W - 1) - u_eff
        dy0 = y_lo - v[None, None, :]
        dy1 = y_lo + (TILE_H - 1) - v[None, None, :]
        zero = jnp.zeros_like(dx0)
        xe = jnp.clip(zero, dx0, dx1)
        ye = jnp.clip(zero, dy0, dy1)
        ca_s = jnp.maximum(ca, 1e-30)
        cc_s = jnp.maximum(cc, 1e-30)
        y1 = jnp.clip(-cb * xe / cc_s, dy0, dy1)
        q1 = ca * xe * xe + 2.0 * cb * xe * y1 + cc * y1 * y1
        x2 = jnp.clip(-cb * ye / ca_s, dx0, dx1)
        q2 = ca * x2 * x2 + 2.0 * cb * x2 * ye + cc * ye * ye
        hit = hit & (jnp.minimum(q1, q2) <= gate_s)
    tile_id = tile_y * ntx + tile_x
    ok = (
        (sy < span_y[None, None, :])
        & (sx < span_x[None, None, :])
        & valid[None, None, :]
        & hit
    )
    key = jax.lax.shift_left(tile_id, _DEPTH_BITS) | qd[None, None, :]
    return jnp.where(ok, key, _SENTINEL)


def _tile_segments(keys_sorted: jnp.ndarray, t_total: int):
    """Per-tile (starts, counts) from the sorted keys.

    counts[t] = #instances of tile t via a fused one-hot compare+reduce over
    the sorted tile ids (streams at VPU rate — measured ~4x cheaper than a
    T+1-query searchsorted, whose binary-search gathers serialize); starts is
    then an exclusive cumsum, exact because real keys sort before sentinels.
    """
    tile_ids = jax.lax.shift_right_logical(keys_sorted, _DEPTH_BITS)
    tid_m = tile_ids.reshape(-1, BLOCK)
    tvals = jnp.arange(t_total, dtype=jnp.int32)
    counts = jnp.sum(
        tid_m[:, :, None] == tvals[None, None, :], axis=(0, 1), dtype=jnp.int32
    )
    starts = jnp.cumsum(counts) - counts
    return starts.astype(jnp.int32), counts, tile_ids.astype(jnp.int32)


def assign_tiles(
    proj: Projected,
    image_shape: tuple[int, int],
    wrap_x: bool,
    instance_cap: Optional[int] = None,
    tier_caps: Optional[tuple[int, ...]] = None,
    with_slots: bool = False,
) -> TileAssignment:
    nty, ntx = num_tiles(image_shape)
    _, w = image_shape
    t_total = ntx * nty
    # key = tile_id << _DEPTH_BITS | depth must stay positive in int32
    assert t_total < (1 << (31 - _DEPTH_BITS)), (
        f"{t_total} tiles overflow the sort key; use larger tiles"
    )
    n = proj.mean2d.shape[0]
    if tier_caps is None:
        tier_caps = tuple(max(n // div, floor) for _, _, div, floor in COMPACT_TIERS)
    assert len(tier_caps) == len(COMPACT_TIERS)
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

    # Elliptical prune (see _tile_rect_keys): gate level from
    # projection._finalize. None (e.g. the hand-built Projected in
    # parallel/render_sharding.py) disables the extra cull.
    if proj.gate_s is not None:
        conic_s = (
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2], proj.gate_s,
        )
    else:
        conic_s = None

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
    # ONE axis; 2x2 corner tier; narrow-tall tier; full-rectangle big tier.
    is_corner = (span_x == 2) & (span_y == 2)
    is_fast = proj.valid & (span_x <= 2) & (span_y <= 2) & ~is_corner
    fits_tall = (span_x <= MED_SPAN_W) & (span_y <= MED_SPAN_H)
    masks = (
        proj.valid & is_corner,
        proj.valid & ~is_fast & ~is_corner & fits_tall,
        proj.valid & ~is_fast & ~is_corner & ~fits_tall,
    )

    # fast tier, slot 0: the top-left tile of the (clamped) rect.
    # Fast tier: NO elliptical cull. A <=2-tile footprint's neighbor tile is
    # essentially never outside the ellipse (the cut targets corner tiles of
    # MULTI-tile rects), and the [N]-sized q1/q2 temporaries measurably blew
    # the razor-thin HBM margin of the 512x1024 train step (r4: decode bench
    # OOM by 41 MB). Compacted tiers below keep the cull — their temps are
    # cap-sized (<= N/16).
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
    # Emission layout is SLOT-MAJOR everywhere ([2, N] fast tier, [span_i,
    # cap_i] per compacted tier): the splat index stays on lanes, so no
    # interleaving relayout is ever materialized. _gather_rows_bwd mirrors
    # this with reshape(span, cap, ROWS).sum(0) reductions.
    iota = jnp.arange(n, dtype=jnp.int32)
    keys_parts = [keys_f0, keys_f1]
    gidx_parts = [iota, iota]

    # Compacted tiers: ONE single-operand sort of key = tier*n + index replaces
    # the per-tier nonzero() compactions (each of which lowered to a 3x costlier
    # pass). Tier windows of the sorted keys are read at the running count
    # offsets with a 2D LANE gather (jnp.take along axis 1 — ~1 ns/lane,
    # vs ~9 ns/index for 1D gathers and a compile to full-array shuffles for
    # traced-start dynamic_slice); indices are recovered as key - tier*n, in
    # stable ascending order exactly like nonzero's.
    code = jnp.full((n,), jnp.int32(len(masks)))
    for i, m in enumerate(masks):
        code = jnp.where(m, jnp.int32(i), code)
    # keys are all-distinct (code*n + iota), so the unstable sort is
    # output-identical — and measurably cheaper (chained-timing r5: 1-op
    # stable 5.74 ms vs unstable 3.06 ms at 3M keys; XLA's stable lowering
    # widens the comparator with an iota tiebreak)
    (sorted_codes,) = jax.lax.sort(
        (code * jnp.int32(n) + iota,), num_keys=1, is_stable=False)
    tier_counts = [jnp.sum(m, dtype=jnp.int32) for m in masks]
    # window positions: tier i occupies [sum(counts[:i]), +cap_i), clamped pad
    pos_parts = []
    start = jnp.int32(0)
    for i, cap_t in enumerate(tier_caps):
        pos_parts.append(start + jnp.arange(cap_t, dtype=jnp.int32))
        start = start + tier_counts[i]
    pos = jnp.clip(jnp.concatenate(pos_parts), 0, n - 1)
    win = jnp.take(sorted_codes[None, :], pos, axis=1)[0]  # [sum caps] lane gather

    # ONE lane gather of the emission attributes for all tiers together.
    # Every row is exactly representable in f32 (ints < 2^24), so a single
    # [9, N] matrix carries them; the gather runs on lanes like the pack's.
    em = jnp.stack(
        [
            tx0.astype(jnp.float32), ty0.astype(jnp.float32),
            span_x.astype(jnp.float32), span_y.astype(jnp.float32),
            qd.astype(jnp.float32), u, v, rx, ry,
        ],
        axis=0,
    )  # [9, N]
    # conic + gate level for the tiers' elliptical cull, gathered separately
    # (keeps `em` and the HBM peak at their r3 size)
    em2 = jnp.stack(list(conic_s), axis=0) if conic_s is not None else None

    dropped = jnp.int32(0)
    tier_idx = []
    off = 0
    for i, ((sh_t, sw_t, _, _), cap_t) in enumerate(zip(COMPACT_TIERS, tier_caps)):
        wi = jax.lax.slice(win, (off,), (off + cap_t,))
        off += cap_t
        cnt = tier_counts[i]
        ok = jnp.arange(cap_t, dtype=jnp.int32) < cnt
        idx = jnp.where(ok, wi - jnp.int32(i) * n, -1)
        tier_idx.append(idx)
        dropped = dropped + jnp.maximum(cnt - cap_t, 0)

        ii = jnp.clip(idx, 0, n - 1)
        ga = jnp.take(em, ii, axis=1)  # [9, cap_t] lane gather
        if em2 is not None:
            g2 = jnp.take(em2, ii, axis=1)  # [4, cap_t]
            cs_t = (g2[0], g2[1], g2[2], g2[3])
        else:
            cs_t = None
        keys_parts.append(
            _tile_rect_keys(
                ga[0].astype(jnp.int32), ga[1].astype(jnp.int32),
                ga[2].astype(jnp.int32), ga[3].astype(jnp.int32),
                ga[4].astype(jnp.int32), ok,
                ntx, nty, sh_t, sw_t, wrap_x, ga[5], ga[6], ga[7], ga[8],
                float(w), cs_t,
            ).reshape(-1)
        )
        gidx_parts.append(
            jnp.broadcast_to(ii[None, :], (sh_t * sw_t, cap_t)).reshape(-1)
        )

    keys = jnp.concatenate(keys_parts)
    gidx = jnp.concatenate(gidx_parts)
    # pad K to a block multiple for the kernel's block-granular DMA
    k = keys.shape[0]
    k_pad = -(-k // BLOCK) * BLOCK
    keys = jnp.pad(keys, (0, k_pad - k), constant_values=_SENTINEL)
    gidx = jnp.pad(gidx, (0, k_pad - k))
    # Unstable 2-key sort (r5). XLA's STABLE lowering widens the comparator
    # with a hidden iota tiebreak — measured 7.60 ms at this K vs 4.82 for
    # the unstable 1-key sort (chained timing). Plain unstable permutes
    # (tile, depth20)-TIED instances differently for different emission
    # inputs, which broke the elliptical-cull output-identity test; making
    # gidx the SECOND SORT KEY (num_keys=2, measured 5.74 ms) restores a
    # deterministic, emission-layout-invariant order (ties compose in
    # gaussian-index order) at ~2 ms below the stable sort. A gaussian never
    # occupies the same tile twice (wrap spans are clamped), so (key, gidx)
    # is unique and the result is a total order.
    if with_slots:
        # Emission order IS slot order, so the slot array is just iota; carrying
        # it through the sort gives the permutation that inverts the unfused
        # pack gather (_gather_rows).
        slot = jnp.arange(k_pad, dtype=jnp.int32)
        keys_sorted, gidx_sorted, slot_sorted = jax.lax.sort(
            (keys, gidx, slot), num_keys=2, is_stable=False
        )
    else:
        keys_sorted, gidx_sorted = jax.lax.sort(
            (keys, gidx), num_keys=2, is_stable=False)
        slot_sorted = None
    if cap < k_pad:
        n_real = jnp.sum((keys_sorted[cap:] != _SENTINEL).astype(jnp.int32))
        dropped = dropped + n_real
        keys_sorted = keys_sorted[:cap]
        gidx_sorted = gidx_sorted[:cap]
        if slot_sorted is not None:
            slot_sorted = slot_sorted[:cap]
    tile_starts, tile_counts, tile_ids = _tile_segments(keys_sorted, t_total)
    return TileAssignment(
        gaussian_idx=gidx_sorted,
        tile_ids=tile_ids,
        tile_starts=tile_starts,
        tile_counts=tile_counts,
        dropped=dropped.astype(jnp.int32),
        num_tiles_x=ntx,
        num_tiles_y=nty,
        slot_ids=slot_sorted,
        tier_idx=tuple(tier_idx),
    )
