"""Pallas TPU tile-compositing kernel with custom VJP — the production hot loop.

TPU-native replacement for the CUDA forward/backward compositing kernels of
diff-gaussian-rasterization-modified (SURVEY.md §2.9).

Orientation is pixels-major [N_PIX, CHUNK] (pixels on sublanes, instances on lanes):
per-instance scalars arrive as natural [1, CHUNK] rows of the packed instance blocks,
pixel coords are [N_PIX, 1] iota columns, and no per-chunk transposes exist. Per chunk:

    dx, dy  = pixel deltas (broadcast [N_PIX, CHUNK], VPU — direct (x - u) form
              avoids the f32 cancellation of an expanded-quadratic matmul)
    power   = -0.5(a dx^2 + c dy^2) - b dx dy
    alpha   = gate(opacity * exp(power))            (gates mirror composite_jax)
    L       = log1p(-alpha)
    E       = L @ M_strict_upper                    (exclusive log-prefix over the
                                                     chunk = transmittance, MXU)
    T_i     = T_carry * exp(E); w = alpha * T_i     (front-to-back weights)
    acc    += w . CD (contract over chunk)          (r g b depth accumulation, MXU)
    T_carry *= exp(rowsum(masked L))
One [N_PIX, 8] -> [8, N_PIX] transpose per tile writes the output planes.

The backward walks ONLY the blocks the forward actually processed (early-exit
count nproc is exported per tile), in reverse, recomputing alpha/E with suffix
state accumulated in VMEM scratch; per-instance gradients come from one pixel-
moment matmul (MXU) plus MXU matmuls for the color/gamma terms — mirroring the
CUDA backward's math. Per-Gaussian gradients are recovered outside by the pack
gather's hand-written transpose (_gather_rows).

Memory layout (tuned around TPU gather lowering — see ops/tiling.py and
scripts/bench_gather.py): per-Gaussian attrs are built LANE-MAJOR [ROWS, N] and
packed once per frame with a SINGLE lane gather straight into contiguous
[NBLK, ROWS, CHUNK] blocks (Gaussians never leave the lane dimension — no
sublane/lane relayout anywhere in the pack or its transpose). Tile segments stay UNALIGNED; the kernels walk
whole 128-instance blocks with per-lane segment masks (boundary blocks are shared by
adjacent tiles — harmless on the read side). The backward writes each tile's
per-block gradients into tile-OWNED output blocks (offsets from a tiny cumsum), so
there are no write conflicts; a BLOCK-level scatter-add (~20k indices, not K rows)
maps them back to instance order. Input DMAs are double-buffered; gradient
write-backs are pipelined one chunk behind.
Equirect azimuth wrap: instance means re-centered to the tile center modulo W
(exact: project_erp caps radii at W/2 - TILE_W/2 - 1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tiling import (
    BLOCK, COMPACT_TIERS, TILE_H, TILE_W,
    TileAssignment,
)

CHUNK = BLOCK  # 128 instance lanes per chunk
N_PIX = TILE_H * TILE_W  # pixels per tile (sublane extent of the kernels)
ROWS = 16  # packed instance rows: u v a b c o cr cg cb depth rx ry pad...

_NEG_CUTOFF = -4.5
_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
_LOG_T_EPS = -9.21034  # log(1e-4)

# Experiment knobs (read at import; used by bench sweeps).
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,      # bf16x3: ~f32 mantissa on MXU, 2x HIGHEST
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("SPLAT360_KERNEL_PRECISION", "highest")]
_EARLY_EXIT = os.environ.get("SPLAT360_KERNEL_EARLY_EXIT", "1") == "1"
# gamma[p,k] = sum_c g_rgbd[c,p] cd[c,k] is a K=4 contraction — 3 split3 MXU
# passes use <4% of the systolic array. The VPU variant transposes the 4
# gradient planes once per tile and accumulates 4 broadcast FMAs per block.
_GAMMA_VPU = os.environ.get("SPLAT360_GAMMA_VPU", "0") == "1"
# Backward-kernel cost-bisection ablations (comma list, PERF DEBUGGING ONLY —
# each one computes WRONG gradients): "dma" skip grad write-backs, "suffix" /
# "gamma" / "moment" zero out one matmul, "asm" skip the grad row assembly.
_ABLATE = frozenset(
    x for x in os.environ.get("SPLAT360_BWD_ABLATE", "").split(",") if x
)
# Forward-kernel cost-bisection ablations (PERF DEBUGGING ONLY — wrong
# outputs): "collect" skip the per-lane pack loop, "unpack" skip the g%8
# select, "residual" skip the built-block write-back, "mxu" zero the prefix
# matmul, "alpha" skip the alpha/exp math.
_FWD_ABLATE = frozenset(
    x for x in os.environ.get("SPLAT360_FWD_ABLATE", "").split(",") if x
)


def _pallas_call(*args, **kwargs):
    """pl.pallas_call, with env-switchable interpret mode.

    SPLAT360_PALLAS_INTERPRET=1 (read at call time) runs the kernels through
    the Pallas interpreter — the same path the CPU test suite exercises via
    monkeypatch — so the multichip dryrun (__graft_entry__.py) can drive the
    production pallas backend on the virtual CPU mesh."""
    if os.environ.get("SPLAT360_PALLAS_INTERPRET", "0") == "1":
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


def _tile_origin(tid, ntx):
    ty = tid // ntx
    tx = tid - ty * ntx
    return (tx * TILE_W).astype(jnp.float32), (ty * TILE_H).astype(jnp.float32)


def _pixel_cols(x0, y0):
    """Pixel coords of the tile as [N_PIX, 1] columns."""
    p = jax.lax.broadcasted_iota(jnp.int32, (N_PIX, 1), 0)
    px = (p % TILE_W).astype(jnp.float32) + x0
    py = (p // TILE_W).astype(jnp.float32) + y0
    return px, py


def _strict_upper(dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c > r).astype(dtype)


def _strict_lower(dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c < r).astype(dtype)


def _contract(a, b, axes, precision=None):
    # HIGHEST: full-f32 MXU passes — the log-prefix sums and color accumulation
    # need f32 mantissas (default bf16 passes cost ~4e-3 relative error).
    return jax.lax.dot_general(
        a, b, dimension_numbers=(axes, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION if precision is None else precision,
    )


def _split_bf16(x):
    """Two-term bf16 split: x == hi + lo with hi bf16-exact, |lo| <= 2^-8|x|.

    A DEFAULT-precision MXU pass rounds f32 operands to bf16; hi passes
    through exactly and lo's own rounding error is ~2^-9|lo| = ~2^-17|x|, so
    feeding the two through separate passes reconstructs ~2^-16 relative
    accuracy (validated against an emulated bf16 MXU in
    tests/test_pallas_composite.py::test_bf16_split_mxu_emulation)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _contract_binary(x, m, axes):
    """x @ m where m has only 0/1 entries (exact in bf16).

    Two DEFAULT passes over the bf16 split of x match HIGHEST (six passes) to
    ~2^-16 relative — 3x cheaper on the MXU. Falls through to a single pass
    when the kernel is configured for DEFAULT precision anyway."""
    d = jax.lax.Precision.DEFAULT
    if _PRECISION == d:
        return _contract(x, m, axes)
    hi, lo = _split_bf16(x)
    return _contract(hi, m, axes, d) + _contract(lo, m, axes, d)


def _split3_exact(x):
    """EXACT 3-term bf16 decomposition: x == hi + mid + lo, every term
    bf16-representable (f32's 24 mantissa bits split 8+8+8 across disjoint
    exponent ranges), so the sum reconstructs x bit-exactly in f32."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, r - mid


def _transpose_mxu(x):
    """Bit-exact [a, b] -> [b, a] transpose on the MXU.

    A sublane<->lane transpose lowers to a Mosaic relayout whose shuffle
    sequence measures ~0.85 us/block in the fused kernels (bisect: the fwd
    unpack + bwd spread ablations). As a matmul against the identity each
    output receives exactly ONE product per pass (no accumulation rounding),
    and the 3-term bf16 split is exact for f32 (_split3_exact) — so three
    DEFAULT MXU passes of a tiny [b, a] x [a, a] contraction reproduce the
    transpose bit-exactly at MXU rate."""
    a = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (a, a), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (a, a), 1)
    ident = (r == c).astype(jnp.float32)
    d = jax.lax.Precision.DEFAULT
    hi, mid, lo = _split3_exact(x)
    y = _contract(hi, ident, ((0,), (0,)), d)
    y = y + _contract(mid, ident, ((0,), (0,)), d)
    return y + _contract(lo, ident, ((0,), (0,)), d)


def _contract_split3(a, b, axes):
    """a . b via a two-sided bf16 split, the negligible lo*lo term dropped.

    Each DEFAULT MXU pass rounds its operands to bf16 (hi exactly, lo with
    ~2^-17-relative-of-x error) and accumulates f32; with the ~2^-16 lo terms
    carried and only the ~2^-32 lo_a*lo_b term omitted, three passes recover
    effectively full f32 mantissas."""
    d = jax.lax.Precision.DEFAULT
    if _PRECISION == d:
        return _contract(a, b, axes)
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    return (
        _contract(a_hi, b_hi, axes, d)
        + _contract(a_hi, b_lo, axes, d)
        + _contract(a_lo, b_hi, axes, d)
    )


def _contract_split3_fusedk(a, b):
    """_contract_split3 for a SMALL-K contraction (a [K, M] . b [K, N] over
    dim 0), issued as ONE MXU pass with the three split terms stacked along
    K (3K total) — same MACs, same summands (f32 accumulate), a third of the
    per-pass issue latency. Only worthwhile when K is small enough that the
    stacking copies are trivial (e.g. the backward's K=4 gamma term)."""
    d = jax.lax.Precision.DEFAULT
    if _PRECISION == d:
        return _contract(a, b, ((0,), (0,)))
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    a3 = jnp.concatenate([a_hi, a_hi, a_lo], axis=0)
    b3 = jnp.concatenate([b_hi, b_lo, b_hi], axis=0)
    return _contract(a3, b3, ((0,), (0,)), d)


def _chunk_alpha(data, px, py, w_img, wrap_x):
    """Per-instance alpha maps for one chunk (pixels-major).

    data: [ROWS, CHUNK]; px, py: [N_PIX, 1].
    Returns (alpha, dx, dy, a, b, c, o, u, v) — alpha/dx/dy [N_PIX, CHUNK],
    scalars [1, CHUNK] (u re-centered to the tile under wrap).
    """
    u = data[0:1, :]
    v = data[1:2, :]
    a = data[2:3, :]
    b = data[3:4, :]
    c = data[4:5, :]
    o = data[5:6, :]
    rad_x = data[10:11, :]
    rad_y = data[11:12, :]
    if wrap_x:
        xc = px[0, 0] + TILE_W * 0.5
        u = u + w_img * jnp.round((xc - u) / w_img)

    dx = px - u   # [N_PIX, CHUNK]
    dy = py - v
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = o * jnp.exp(power)
    gate = (
        (jnp.abs(dx) <= rad_x)
        & (jnp.abs(dy) <= rad_y)
        & (power > _NEG_CUTOFF)
        & (power <= 0.0)
        & (alpha >= _ALPHA_MIN)
    )
    alpha = jnp.where(gate, jnp.minimum(alpha, 0.99), 0.0)
    return alpha, dx, dy, a, b, c, o, u, v


def _moment_matrix():
    """Constant [6, N_PIX] pixel-moment rows in TILE-LOCAL coordinates.

    Rows: 1, xl, yl, xl^2, yl^2, xl*yl with xl in [0, TILE_W), yl in [0, TILE_H).
    Local coords keep every entry <= TILE_W^2, so the moment matmul is accurate
    even under reduced-precision MXU passes; the per-instance quadratic sums are
    recovered from the moments by a shift to (u, v) afterwards (see
    _backward_kernel) — an exact binomial expansion, all [1, CHUNK] arithmetic.
    """
    p = jax.lax.broadcasted_iota(jnp.int32, (1, N_PIX), 1)
    xl = (p % TILE_W).astype(jnp.float32)
    yl = (p // TILE_W).astype(jnp.float32)
    one = jnp.ones((1, N_PIX), jnp.float32)
    return jnp.concatenate([one, xl, yl, xl * xl, yl * yl, xl * yl], axis=0)


def _segment_mask(blk0, j, start, count):
    """Boolean [1, CHUNK]: lanes of block blk0+j inside [start, start+count)."""
    g = (blk0 + j) * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return (g >= start) & (g < start + count)


def _forward_kernel(
    starts_ref, counts_ref,  # scalar prefetch [T] (unaligned segment offsets)
    inst_ref,                # HBM [NBLK, ROWS, CHUNK]
    acc_ref,                 # out [8, N_PIX] per tile: r g b depth T 0 0 0
    bufs, racc, tacc, sems,
    *, ntx, w_img, wrap_x,
):
    tid = pl.program_id(0)
    x0, y0 = _tile_origin(tid, ntx)
    px, py = _pixel_cols(x0, y0)

    start = starts_ref[tid]
    count = counts_ref[tid]
    blk0 = start // CHUNK
    n_blocks = (start + count + CHUNK - 1) // CHUNK - blk0

    racc[:] = jnp.zeros((N_PIX, 8), jnp.float32)
    tacc[:] = jnp.zeros((N_PIX, 1), jnp.float32)  # log-transmittance carry

    mup = _strict_upper(jnp.float32)

    def in_copy(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[blk0 + j], bufs.at[slot], sems.at[slot]
        )

    @pl.when(n_blocks > 0)
    def _():
        in_copy(0, 0).start()

    def live_pred(j):
        # Once every pixel in the tile saturates the remaining blocks are
        # skipped permanently. The count of processed blocks is exported so
        # the backward walks exactly the blocks the forward accumulated.
        return (jnp.max(tacc[:]) >= _LOG_T_EPS) if _EARLY_EXIT else (j >= 0)

    def body(j):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            in_copy(1 - slot, j + 1).start()

        in_copy(slot, j).wait()

        data = jnp.where(_segment_mask(blk0, j, start, count), bufs[slot], 0.0)

        alpha, *_ = _chunk_alpha(data, px, py, w_img, wrap_x)
        lg = jnp.log1p(-alpha)
        e = _contract_binary(lg, mup, ((1,), (0,)))  # exclusive prefix over chunk
        # T carried in log space: never underflows, and the backward can
        # reconstruct per-block T by exact telescoping of the log sums.
        t_i = jnp.exp(tacc[:] + e)
        # unmasked T decay + post-decay contribution gate (see rasterizer_ref)
        w = jnp.where(t_i * (1.0 - alpha) >= _T_EPS, alpha * t_i, 0.0)

        cd = data[6:10, :]  # [4, CHUNK]: r g b depth
        racc[:, 0:4] = racc[:, 0:4] + _contract_split3(w, cd, ((1,), (1,)))
        tacc[:] = tacc[:] + jnp.sum(lg, axis=1, keepdims=True)
        return j + 1

    # While-loop early exit: saturated tiles stop walking (no DMA, no math for
    # dead blocks — only ~17% of blocks are live at the north-star load).
    n_processed = jax.lax.while_loop(
        lambda j: (j < n_blocks) & live_pred(j), body, jnp.int32(0)
    )
    # Drain the dangling prefetch: blocks 0..n_processed-1 were waited; the
    # prefetch for block n_processed was started (by the prologue if 0, by the
    # previous body otherwise) iff n_processed < n_blocks.
    @pl.when(n_processed < n_blocks)
    def _():
        in_copy(jax.lax.rem(n_processed, 2), n_processed).wait()

    planes = jnp.concatenate(
        [racc[:, 0:4], jnp.exp(tacc[:]), tacc[:],
         jnp.full((N_PIX, 1), n_processed.astype(jnp.float32)),
         jnp.zeros((N_PIX, 1), jnp.float32)], axis=1
    )  # r g b depth T logT n_processed 0
    acc_ref[:] = planes.T  # one [N_PIX, 8] -> [8, N_PIX] transpose per tile


def _forward_kernel_fused(
    starts_ref, counts_ref,  # scalar prefetch [T]
    gidx_ref,                # HBM [NBLK, 1, CHUNK] int32 sorted gaussian ids
    attrs_ref,               # VMEM [NSUB, 128] packed per-gaussian attrs
    acc_ref,                 # out0 [8, N_PIX] per tile
    inst_ref,                # out1 HBM [NBLK, ROWS, CHUNK] built-block residual
    coll, stage, racc, tacc, gs_smem, gv, sems_gs, sems_gv, sems_out,
    *, ntx, w_img, wrap_x,
):
    """Forward compositing with the instance pack FUSED into the kernel.

    The XLA pack gathered attrs for every emitted instance (K ~ 2N lanes,
    ~15 ms at the north-star load) even though the early-exiting forward
    reads only ~14% of the blocks. Here the full attribute table lives in
    VMEM as [NSUB, 128] (8 gaussians x 16 attr lanes per sublane row,
    ~67 MB at N=1.05M — v5e VMEM is 128 MB) and each PROCESSED block is
    built in-kernel: a per-lane dynamic-sublane read collects the 8-packed
    rows, then a static-slice select keyed on g%8 unpacks them to
    [ROWS, CHUNK]. Built blocks are written back to HBM as the residual the
    backward re-reads. Replaces the CUDA rasterizer's global duplicate-
    expanded instance buffer (SURVEY.md §2.9)."""
    tid = pl.program_id(0)
    x0, y0 = _tile_origin(tid, ntx)
    px, py = _pixel_cols(x0, y0)

    start = starts_ref[tid]
    count = counts_ref[tid]
    blk0 = start // CHUNK
    n_blocks = (start + count + CHUNK - 1) // CHUNK - blk0

    racc[:] = jnp.zeros((N_PIX, 8), jnp.float32)
    tacc[:] = jnp.zeros((N_PIX, 1), jnp.float32)

    mup = _strict_upper(jnp.float32)

    def gs_copy(slot, j):
        return pltpu.make_async_copy(
            gidx_ref.at[blk0 + j], gs_smem.at[slot], sems_gs.at[slot]
        )

    def gv_copy(slot, j):
        return pltpu.make_async_copy(
            gidx_ref.at[blk0 + j], gv.at[slot], sems_gv.at[slot]
        )

    def out_copy(slot, j):
        return pltpu.make_async_copy(
            stage.at[slot], inst_ref.at[blk0 + j], sems_out.at[slot]
        )

    @pl.when(n_blocks > 0)
    def _():
        gs_copy(0, 0).start()
        gv_copy(0, 0).start()

    def live_pred(j):
        return (jnp.max(tacc[:]) >= _LOG_T_EPS) if _EARLY_EXIT else (j >= 0)

    def body(j):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            gs_copy(1 - slot, j + 1).start()
            gv_copy(1 - slot, j + 1).start()

        gs_copy(slot, j).wait()
        gv_copy(slot, j).wait()

        # Build the block from the packed VMEM table: collect each lane's
        # 8-gaussian row, then unpack by g%8 with static slices.
        def collect(l, _):
            gl = gs_smem[slot, 0, l] >> 3
            coll[pl.ds(l, 1), :] = attrs_ref[pl.ds(gl, 1), :]
            return 0

        if "collect" not in _FWD_ABLATE:
            jax.lax.fori_loop(0, CHUNK, collect, 0, unroll=CHUNK)
        if "unpack" in _FWD_ABLATE:
            data_blk = coll[:, 0:ROWS].T
        else:
            # Transpose FIRST (bit-exact MXU transpose, not a Mosaic
            # relayout), then unpack with [1, CHUNK] lane-mask selects that
            # broadcast over sublanes — no [CHUNK, 1] gmod relayout either.
            coll_t = _transpose_mxu(coll[:])  # [128, CHUNK]
            gmod = gv[slot] & 7  # [1, CHUNK]
            data_blk = jnp.zeros((ROWS, CHUNK), jnp.float32)
            for b in range(8):
                data_blk = data_blk + jnp.where(
                    gmod == b, coll_t[16 * b : 16 * b + 16, :], 0.0
                )

        # residual write-back (the backward re-reads built blocks)
        if "residual" not in _FWD_ABLATE:
            @pl.when(j >= 2)
            def _():
                out_copy(slot, j - 2).wait()

            stage[slot] = data_blk
            out_copy(slot, j).start()

        data = jnp.where(
            _segment_mask(blk0, j, start, count), data_blk, 0.0
        )
        if "alpha" in _FWD_ABLATE:
            alpha = data[0:1, :] * 1e-9 + jnp.zeros((N_PIX, CHUNK), jnp.float32)
        else:
            alpha, *_ = _chunk_alpha(data, px, py, w_img, wrap_x)
        lg = jnp.log1p(-alpha)
        if "mxu" in _FWD_ABLATE:
            e = lg
        else:
            e = _contract_binary(lg, mup, ((1,), (0,)))
        t_i = jnp.exp(tacc[:] + e)
        w = jnp.where(t_i * (1.0 - alpha) >= _T_EPS, alpha * t_i, 0.0)

        cd = data[6:10, :]
        racc[:, 0:4] = racc[:, 0:4] + _contract_split3(w, cd, ((1,), (1,)))
        tacc[:] = tacc[:] + jnp.sum(lg, axis=1, keepdims=True)
        return j + 1

    n_processed = jax.lax.while_loop(
        lambda j: (j < n_blocks) & live_pred(j), body, jnp.int32(0)
    )
    # Drain the dangling gidx prefetch and trailing residual write-backs.
    @pl.when(n_processed < n_blocks)
    def _():
        gs_copy(jax.lax.rem(n_processed, 2), n_processed).wait()
        gv_copy(jax.lax.rem(n_processed, 2), n_processed).wait()

    if "residual" not in _FWD_ABLATE:
        @pl.when(n_processed >= 1)
        def _():
            out_copy(jax.lax.rem(n_processed - 1, 2), n_processed - 1).wait()

        @pl.when(n_processed >= 2)
        def _():
            out_copy(jax.lax.rem(n_processed - 2, 2), n_processed - 2).wait()

    planes = jnp.concatenate(
        [racc[:, 0:4], jnp.exp(tacc[:]), tacc[:],
         jnp.full((N_PIX, 1), n_processed.astype(jnp.float32)),
         jnp.zeros((N_PIX, 1), jnp.float32)], axis=1
    )
    acc_ref[:] = planes.T


def _backward_kernel_fused(
    starts_ref, counts_ref, nproc_ref,
    inst_ref,                # HBM [NBLK, ROWS, CHUNK] (forward residual)
    gidx_ref,                # HBM [NBLK, 1, CHUNK] int32
    gacc_ref,                # [8, N_PIX]: gr gg gb gdepth gT logT_final 0 0
    accp_ref,                # out VMEM [NSUB, 128] packed per-gaussian grads
    bufs, suffix_scratch, apsi_scratch, stage,
    gs_smem, gv, sems_in, sems_gs, sems_gv,
    *, ntx, w_img, wrap_x,
):
    """Backward with the per-gaussian gradient reduction FUSED into the kernel.

    The separate XLA reduction (out-block map + nonzero + block gather +
    transpose + 56 ns/index scatter-add, ~34 ms at the north-star load) is
    replaced by a VMEM-resident packed accumulator [NSUB, 128] (same layout
    as the forward attrs table): after the per-block gradient math, a
    per-lane read-modify-write adds each instance's 16 gradient lanes at
    sublane g//8, lane offset 16*(g%8). The grid is sequential on the core,
    so RMW is race-free and deterministic; foreign/segment-masked lanes add
    exact zeros. Mirrors the role of the CUDA backward's atomicAdd
    accumulation (SURVEY.md §2.9) without atomics."""
    tid = pl.program_id(0)
    x0, y0 = _tile_origin(tid, ntx)
    px, py = _pixel_cols(x0, y0)

    @pl.when(tid == 0)
    def _():
        accp_ref[:] = jnp.zeros_like(accp_ref)

    start = starts_ref[tid]
    count = counts_ref[tid]
    nproc = nproc_ref[tid]
    blk0 = start // CHUNK
    n_blocks = (start + count + CHUNK - 1) // CHUNK - blk0
    lo = n_blocks - nproc

    mup = _strict_upper(jnp.float32)
    mlow = _strict_lower(jnp.float32)

    lt_final = gacc_ref[5:6, :].T
    g_rgbd = gacc_ref[0:4, :]
    gt_term = (gacc_ref[4:5, :] * jnp.exp(gacc_ref[5:6, :])).T

    suffix_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)
    apsi_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)

    def in_copy(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[blk0 + j], bufs.at[slot], sems_in.at[slot]
        )

    def gs_copy(slot, j):
        return pltpu.make_async_copy(
            gidx_ref.at[blk0 + j], gs_smem.at[slot], sems_gs.at[slot]
        )

    def gv_copy(slot, j):
        return pltpu.make_async_copy(
            gidx_ref.at[blk0 + j], gv.at[slot], sems_gv.at[slot]
        )

    @pl.when(nproc > 0)
    def _():
        slot0 = jax.lax.rem(lo, 2)
        in_copy(slot0, nproc - 1).start()
        gs_copy(slot0, nproc - 1).start()
        gv_copy(slot0, nproc - 1).start()

    def body(rj, carry):
        j = n_blocks - 1 - rj
        slot = jax.lax.rem(rj, 2)

        @pl.when(rj + 1 < n_blocks)
        def _():
            in_copy(1 - slot, j - 1).start()
            gs_copy(1 - slot, j - 1).start()
            gv_copy(1 - slot, j - 1).start()

        in_copy(slot, j).wait()

        data = jnp.where(
            _segment_mask(blk0, j, start, count), bufs[slot], 0.0
        )
        alpha, dx, dy, a, b, c, o, u_eff, v_eff = _chunk_alpha(
            data, px, py, w_img, wrap_x
        )
        lg = jnp.log1p(-alpha)
        sum_lg = jnp.sum(lg, axis=1, keepdims=True)
        log_t_suffix = suffix_scratch[:]
        log_t_end = lt_final - log_t_suffix
        log_t_start = log_t_end - sum_lg
        suffix_scratch[:] = log_t_suffix + sum_lg
        del log_t_end

        @pl.when(jnp.max(log_t_start) >= _LOG_T_EPS)
        def _():
            e = _contract_binary(lg, mup, ((1,), (0,)))
            t_i = jnp.exp(log_t_start + e)
            contrib = t_i * (1.0 - alpha) >= _T_EPS
            w = jnp.where(contrib, alpha * t_i, 0.0)

            cd = data[6:10, :]
            if "gamma" in _ABLATE:
                gamma = jnp.zeros((N_PIX, CHUNK), jnp.float32)
            else:
                gamma = _contract_split3_fusedk(g_rgbd, cd)
            psi = w * gamma
            if "suffix" in _ABLATE:
                suffix = jnp.zeros((N_PIX, CHUNK), jnp.float32)
            else:
                suffix = _contract_binary(psi, mlow, ((1,), (0,)))

            a_psi = apsi_scratch[:]
            g_alpha = t_i * gamma - (suffix + a_psi + gt_term) / (1.0 - alpha)
            g_alpha = jnp.where(contrib, g_alpha, 0.0)
            g_p = g_alpha * alpha

            g_cd = _contract_split3(g_rgbd, w, ((1,), (0,)))

            mom = _contract_split3(_moment_matrix(), g_p, ((1,), (0,)))
            m0, mx, my, mxx, myy, mxy = (mom[i : i + 1, :] for i in range(6))
            ul = u_eff - x0
            vl = v_eff - y0
            s_dx = mx - ul * m0
            s_dy = my - vl * m0
            s_dxdx = mxx - 2.0 * ul * mx + ul * ul * m0
            s_dydy = myy - 2.0 * vl * my + vl * vl * m0
            s_dxdy = mxy - ul * my - vl * mx + ul * vl * m0

            g_o = m0 / jnp.maximum(o, 1e-12)
            g_a = -0.5 * s_dxdx
            g_b = -s_dxdy
            g_c = -0.5 * s_dydy
            g_u = a * s_dx + b * s_dy
            g_v = c * s_dy + b * s_dx

            grad = jnp.concatenate(
                [
                    g_u, g_v, g_a, g_b, g_c, g_o, g_cd,
                    jnp.zeros((ROWS - 10, CHUNK), jnp.float32),
                ],
                axis=0,
            )
            grad = jnp.where(
                _segment_mask(blk0, j, start, count), grad, 0.0
            )
            # Spread each lane's 16 gradient rows to its packed lane offset
            # (16 * (g%8)), then RMW-accumulate at sublane g//8.
            gs_copy(slot, j).wait()
            gv_copy(slot, j).wait()
            if "spread" not in _ABLATE:
                # Build the spread in the grad's native [ROWS-major] layout
                # with [1, CHUNK] lane-mask selects, then ONE bit-exact MXU
                # transpose to [CHUNK, 128] (replaces the measured-hot
                # Mosaic relayout of grad.T + the [CHUNK, 1] gmod relayout).
                gmod = gv[slot] & 7  # [1, CHUNK]
                parts = [
                    jnp.where(gmod == bb, grad, 0.0) for bb in range(8)
                ]
                stage[:] = _transpose_mxu(
                    jnp.concatenate(parts, axis=0)  # [128, CHUNK]
                )

            def rmw(l, _):
                gl = gs_smem[slot, 0, l] >> 3
                accp_ref[pl.ds(gl, 1), :] = (
                    accp_ref[pl.ds(gl, 1), :] + stage[pl.ds(l, 1), :]
                )
                return 0

            if "rmw" not in _ABLATE:
                jax.lax.fori_loop(0, CHUNK, rmw, 0, unroll=CHUNK)
            apsi_scratch[:] = a_psi + jnp.sum(psi, axis=1, keepdims=True)

        # If the gated region was skipped, its gidx DMAs are still in flight:
        # wait unconditionally (wait after the pl.when is a no-op when already
        # waited? no — semaphores would double-decrement). Instead wait here
        # only when the region was skipped.
        @pl.when(jnp.max(log_t_start) < _LOG_T_EPS)
        def _():
            gs_copy(slot, j).wait()
            gv_copy(slot, j).wait()

        return carry

    jax.lax.fori_loop(lo, n_blocks, body, jnp.int32(0))


def _backward_kernel(
    starts_ref, counts_ref, obase_ref, nproc_ref,
    inst_ref,                # HBM [NBLK, ROWS, CHUNK]
    gacc_ref,                # [8, N_PIX]: gr gg gb gdepth gT T_final 0 0
    dout_ref,                # out HBM [NBLK_OUT, ROWS, CHUNK] tile-owned blocks
    bufs, grad_bufs, suffix_scratch, apsi_scratch, sems, out_sems,
    *, ntx, w_img, wrap_x,
):
    tid = pl.program_id(0)
    x0, y0 = _tile_origin(tid, ntx)
    px, py = _pixel_cols(x0, y0)

    start = starts_ref[tid]
    count = counts_ref[tid]
    obase = obase_ref[tid]
    nproc = nproc_ref[tid]  # blocks the forward actually accumulated
    blk0 = start // CHUNK
    n_blocks = (start + count + CHUNK - 1) // CHUNK - blk0
    # The forward early-exited blocks >= nproc: zero weight, zero gradients,
    # absent from the telescoping suffix. The reverse walk starts at rj = lo so
    # those blocks are NEVER touched — no DMA, no math, no write-back (the host
    # wrapper zero-masks their never-written output blocks by nproc). At the
    # north-star load only ~17% of blocks are live, and the per-block loop
    # skeleton dominated the old walk-everything backward (132 of 168 ms).
    lo = n_blocks - nproc

    mup = _strict_upper(jnp.float32)
    mlow = _strict_lower(jnp.float32)

    lt_final = gacc_ref[5:6, :].T    # [N_PIX, 1] log T_final (exact, no clamping)
    g_rgbd = gacc_ref[0:4, :]        # [4, N_PIX]
    g_rgbd_t = g_rgbd.T if _GAMMA_VPU else None  # [N_PIX, 4], once per tile
    gt_term = (gacc_ref[4:5, :] * jnp.exp(gacc_ref[5:6, :])).T  # g_T * T_final

    # Suffix accumulators live in VMEM scratch (updated in place inside the
    # body) rather than loop carries: dead iterations vanish entirely and live
    # ones skip the zero+select+carry dance.
    suffix_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)
    apsi_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)

    def in_copy(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[blk0 + j], bufs.at[slot], sems.at[slot]
        )

    def out_copy(slot, j):
        return pltpu.make_async_copy(
            grad_bufs.at[slot], dout_ref.at[obase + j], out_sems.at[slot]
        )

    @pl.when(nproc > 0)
    def _():
        in_copy(jax.lax.rem(lo, 2), nproc - 1).start()

    def body(rj, carry):
        j = n_blocks - 1 - rj
        slot = jax.lax.rem(rj, 2)

        @pl.when(rj + 1 < n_blocks)
        def _():
            in_copy(1 - slot, j - 1).start()

        in_copy(slot, j).wait()
        if "dma" not in _ABLATE:
            # wait for the grad write-back that used this slot two chunks ago
            @pl.when(rj >= lo + 2)
            def _():
                out_copy(slot, j + 2).wait()

        grad_bufs[slot] = jnp.zeros((ROWS, CHUNK), jnp.float32)

        data = jnp.where(
            _segment_mask(blk0, j, start, count), bufs[slot], 0.0
        )
        alpha, dx, dy, a, b, c, o, u_eff, v_eff = _chunk_alpha(
            data, px, py, w_img, wrap_x
        )
        lg = jnp.log1p(-alpha)
        sum_lg = jnp.sum(lg, axis=1, keepdims=True)
        # T at block end/start from the full (unmasked) decay — no fixed
        # point.
        log_t_suffix = suffix_scratch[:]
        log_t_end = lt_final - log_t_suffix
        log_t_start = log_t_end - sum_lg
        suffix_scratch[:] = log_t_suffix + sum_lg

        # Skip the gradient math when every pixel was already saturated
        # before this (deeper) block: t <= t_start < eps => nothing here.
        @pl.when(jnp.max(log_t_start) >= _LOG_T_EPS)
        def _():
            e = _contract_binary(lg, mup, ((1,), (0,)))
            t_i = jnp.exp(log_t_start + e)
            contrib = t_i * (1.0 - alpha) >= _T_EPS
            w = jnp.where(contrib, alpha * t_i, 0.0)

            cd = data[6:10, :]  # [4, CHUNK]
            # gamma[p, k] = c_k . g_rgbd(p) + d_k g_depth(p)  (MXU)
            if "gamma" in _ABLATE:
                gamma = jnp.zeros((N_PIX, CHUNK), jnp.float32)
            elif _GAMMA_VPU:
                gamma = (
                    g_rgbd_t[:, 0:1] * cd[0:1, :]
                    + g_rgbd_t[:, 1:2] * cd[1:2, :]
                    + g_rgbd_t[:, 2:3] * cd[2:3, :]
                    + g_rgbd_t[:, 3:4] * cd[3:4, :]
                )  # [N_PIX, CHUNK]
            else:
                gamma = _contract_split3_fusedk(g_rgbd, cd)  # [N_PIX, CHUNK]
            psi = w * gamma
            # suffix[p, k] = sum_{j>k} psi[p, j]  (psi @ strict_lower, MXU)
            if "suffix" in _ABLATE:
                suffix = jnp.zeros((N_PIX, CHUNK), jnp.float32)
            else:
                suffix = _contract_binary(psi, mlow, ((1,), (0,)))

            a_psi = apsi_scratch[:]
            g_alpha = t_i * gamma - (suffix + a_psi + gt_term) / (1.0 - alpha)
            g_alpha = jnp.where(contrib, g_alpha, 0.0)
            # d alpha / d power = alpha below the 0.99 cap (as CUDA)
            g_p = g_alpha * alpha  # [N_PIX, CHUNK]

            # color/depth grads: dL/dcd[c,k] = sum_p g_rgbd[c,p] w[p,k]
            g_cd = _contract_split3(g_rgbd, w, ((1,), (0,)))  # [4, CHUNK]

            # Per-instance quadratic sums via ONE moment matmul (MXU) instead
            # of six sublane reductions: M[r,k] = sum_p Pm[r,p] g_p[p,k] gives
            # the 0th/1st/2nd moments of g_p over tile-local pixel coords;
            # the sums over dx = xl - ul expand binomially from the moments.
            if "moment" in _ABLATE:
                mom = jnp.zeros((6, CHUNK), jnp.float32)
            else:
                mom = _contract_split3(
                    _moment_matrix(), g_p, ((1,), (0,))
                )  # [6, CHUNK]
            m0, mx, my, mxx, myy, mxy = (mom[i : i + 1, :] for i in range(6))
            ul = u_eff - x0  # [1, CHUNK] tile-local instance centers
            vl = v_eff - y0
            s_dx = mx - ul * m0
            s_dy = my - vl * m0
            s_dxdx = mxx - 2.0 * ul * mx + ul * ul * m0
            s_dydy = myy - 2.0 * vl * my + vl * vl * m0
            s_dxdy = mxy - ul * my - vl * mx + ul * vl * m0

            g_o = m0 / jnp.maximum(o, 1e-12)
            g_a = -0.5 * s_dxdx
            g_b = -s_dxdy
            g_c = -0.5 * s_dydy
            g_u = a * s_dx + b * s_dy
            g_v = c * s_dy + b * s_dx

            if "asm" not in _ABLATE:
                grad = jnp.concatenate(
                    [
                        g_u, g_v, g_a, g_b, g_c, g_o, g_cd,
                        jnp.zeros((ROWS - 10, CHUNK), jnp.float32),
                    ],
                    axis=0,
                )  # [ROWS, CHUNK]
                grad_bufs[slot] = jnp.where(
                    _segment_mask(blk0, j, start, count), grad, 0.0
                )
            apsi_scratch[:] = a_psi + jnp.sum(psi, axis=1, keepdims=True)

        if "dma" not in _ABLATE:
            out_copy(slot, j).start()

        return carry

    jax.lax.fori_loop(lo, n_blocks, body, jnp.int32(0))

    if "dma" not in _ABLATE:
        # drain the last (up to two) in-flight grad write-backs
        @pl.when(nproc >= 1)
        def _():
            out_copy(jax.lax.rem(n_blocks - 1, 2), 0).wait()

        @pl.when(nproc >= 2)
        def _():
            out_copy(jax.lax.rem(n_blocks - 2, 2), 1).wait()


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows(n, attrs, gidx, slot, tier_idx):
    """attrs[N, ROWS] -> rows[K, ROWS] with a fast hand-written transpose.

    The autograd transpose of this gather is a K-row scatter-add into N
    Gaussians — measured ~270 ms at the north-star load (K=2.6M), the single
    biggest cost of the fwd+bwd pipeline. Because the emission layout is
    structured ([N, 2] fast-tier slots, then one [cap_i, span_i] block per
    COMPACT_TIERS entry, each emission slot used at most once), the transpose
    is instead:

      inv[s] = sorted position of emission slot s (one unique int32 scatter)
      g_em   = g_rows[inv]                        (row gather, K_em rows)
      g_fast = g_em[:2N]  .reshape(N, 2, ROWS).sum(1)     (layout reduction)
      per compacted tier: reshape-sum, scatter-added at tier_idx[i]
               (cap_i ~ N/8 .. N/256 rows: tiny scatters)

    measured ~6x cheaper than the scatter-add (sort/gather/reduce vs per-index
    scatter costs — see scripts/bench_scatter.py)."""
    del slot, tier_idx
    return attrs[gidx]


def _gather_rows_fwd(n, attrs, gidx, slot, tier_idx):
    return attrs[gidx], (slot, tier_idx)


def _gather_rows_bwd(n, res, g_rows):
    slot, tier_idx = res
    k = g_rows.shape[0]
    spans = [sh * sw for sh, sw, _, _ in COMPACT_TIERS]
    e_real = 2 * n + sum(
        idx.shape[0] * sp for idx, sp in zip(tier_idx, spans)
    )
    e = -(-e_real // CHUNK) * CHUNK  # emission size
    inv = (
        jnp.full((e,), k, jnp.int32)
        .at[slot]
        .set(jnp.arange(k, dtype=jnp.int32), unique_indices=True, mode="drop")
    )
    g_em = g_rows[jnp.clip(inv, 0, k - 1)]
    g_em = jnp.where((inv < k)[:, None], g_em, 0.0)
    # Emission layout is slot-major ([2, N] fast tier, [span_i, cap_i] per
    # compacted tier — see assign_tiles), so tier reductions sum over axis 0.
    g_attrs = g_em[: 2 * n].reshape(2, n, -1).sum(axis=0)
    off = 2 * n
    for idx, sp in zip(tier_idx, spans):
        seg = g_em[off : off + idx.shape[0] * sp]
        off += idx.shape[0] * sp
        g_seg = seg.reshape(sp, -1, g_rows.shape[1]).sum(axis=0)
        ok = idx >= 0
        g_seg = jnp.where(ok[:, None], g_seg, 0.0)
        g_attrs = g_attrs.at[jnp.where(ok, idx, n)].add(g_seg, mode="drop")
    return g_attrs, None, None, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _build_attrs_t(mean2d, conic, colors, opacities, depths, radii):
    """Stack per-Gaussian attributes as [ROWS, N] — Gaussians on LANES.

    The lane-major layout is what makes the pack gather cheap: gathering
    [ROWS, N] along axis 1 into [ROWS, NBLK, CHUNK] blocks lowers to a
    vectorized lane gather (~1 ns/row measured) instead of the ~42 ns/row
    row-gather + sublane/lane transpose of the [N, ROWS] layout — the
    difference is 70 ms vs 2 ms at the north-star load
    (scripts/bench_gather.py)."""
    n = mean2d.shape[0]
    return jnp.concatenate(
        [
            mean2d[:, 0][None], mean2d[:, 1][None],
            conic[:, 0][None], conic[:, 1][None], conic[:, 2][None],
            opacities[None],
            colors[:, 0][None], colors[:, 1][None], colors[:, 2][None],
            depths[None],
            radii[:, 0][None], radii[:, 1][None],
            jnp.zeros((ROWS - 12, n), mean2d.dtype),
        ],
        axis=0,
    )  # [ROWS, N]


def _build_attrs(mean2d, conic, colors, opacities, depths, radii):
    """Stack per-Gaussian attributes as [N, ROWS] (one elementwise build)."""
    n = mean2d.shape[0]
    return jnp.stack(
        [
            mean2d[:, 0], mean2d[:, 1],
            conic[:, 0], conic[:, 1], conic[:, 2],
            opacities,
            colors[:, 0], colors[:, 1], colors[:, 2],
            depths,
            radii[:, 0], radii[:, 1],
            jnp.zeros((n,), mean2d.dtype),
            jnp.zeros((n,), mean2d.dtype),
            jnp.zeros((n,), mean2d.dtype),
            jnp.zeros((n,), mean2d.dtype),
        ],
        axis=1,
    )  # [N, ROWS]


def _pack_instances(
    assignment, mean2d, conic, colors, opacities, depths, radii
):
    """Pack per-instance attributes as contiguous [NBLK, ROWS, CHUNK].

    One elementwise attrs build + ONE row gather (the per-index cost dominates on
    TPU, so everything else is arithmetic)."""
    n = mean2d.shape[0]
    t_total = assignment.num_tiles_x * assignment.num_tiles_y
    assert assignment.slot_ids is not None, (
        "_pack_instances needs assign_tiles(..., with_slots=True)"
    )
    attrs = _build_attrs(mean2d, conic, colors, opacities, depths, radii)
    rows = _gather_rows(
        n, attrs, assignment.gaussian_idx, assignment.slot_ids,
        assignment.tier_idx,
    )  # [K, ROWS] — the one gather (custom transpose, see _gather_rows)
    valid = assignment.tile_ids < t_total
    rows = jnp.where(valid[:, None], rows, 0.0)
    k = rows.shape[0]
    nblk = k // CHUNK
    return rows.reshape(nblk, CHUNK, ROWS).transpose(0, 2, 1)


def _out_block_layout(starts, counts, nblk_in):
    """Tile-owned output block offsets for the backward.

    Returns (obase [T] int32 block offsets, nblk_out static int)."""
    t = counts.shape[0]
    blk0 = starts // CHUNK
    nblocks = (starts + counts + CHUNK - 1) // CHUNK - blk0
    obase = jnp.cumsum(nblocks) - nblocks
    nblk_out = nblk_in + t  # each tile adds at most one straddle block
    return obase.astype(jnp.int32), nblk_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _composite_core(
    inst, starts, counts, tile_ids, n_tiles_y, n_tiles_x, w_img, wrap_x
):
    return _composite_core_fwd_impl(
        inst, starts, counts, n_tiles_y, n_tiles_x, w_img, wrap_x
    )


def _composite_core_fwd_impl(inst, starts, counts, nty, ntx, w_img, wrap_x):
    t = nty * ntx
    kernel = functools.partial(
        _forward_kernel, ntx=ntx, w_img=float(w_img), wrap_x=wrap_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, N_PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((N_PIX, 8), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * 8, N_PIX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(starts, counts, inst)
    return acc


def _composite_core_fwd(
    inst, starts, counts, tile_ids, nty, ntx, w_img, wrap_x
):
    acc = _composite_core_fwd_impl(inst, starts, counts, nty, ntx, w_img, wrap_x)
    t = nty * ntx
    planes = acc.reshape(t, 8, N_PIX)
    lt_final = planes[:, 5, :]  # [T, N_PIX] log T
    nproc = planes[:, 6, 0].astype(jnp.int32)  # [T] blocks processed (early exit)
    return acc, (inst, starts, counts, tile_ids, lt_final, nproc)


def _backward_call(inst, starts, counts, lt_final, nproc, g_acc, nty, ntx,
                   w_img, wrap_x):
    """Run the backward pallas kernel; returns (dout, obase, nblk_out)."""
    t = nty * ntx
    nblk_in = inst.shape[0]
    obase, nblk_out = _out_block_layout(starts, counts, nblk_in)

    kernel = functools.partial(
        _backward_kernel, ntx=ntx, w_img=float(w_img), wrap_x=wrap_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (8, N_PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((N_PIX, 1), jnp.float32),  # log-T suffix accumulator
            pltpu.VMEM((N_PIX, 1), jnp.float32),  # psi suffix-sum accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # fold log T_final into plane 5 of the gradient planes so a single aligned
    # (8, N_PIX) block carries both. (The forward's logT output plane is not a
    # differentiable output — its cotangent slot is overwritten here.)
    combined = g_acc.reshape(t, 8, N_PIX).at[:, 5, :].set(lt_final)
    combined = combined.reshape(t * 8, N_PIX)
    dout = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk_out, ROWS, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(starts, counts, obase, nproc, inst, combined)
    return dout, obase, nblk_out


def _out_block_map(starts, counts, obase, nproc, nblk_out, t):
    """Out-block -> in-block mapping and liveness.

    Out-block o belongs to tile T(o) = searchsorted-style rank of o in obase,
    and is tile T's segment-masked copy of in-block blk0[T] + (o - obase[T]);
    summing every tile's copy of an in-block is exact because segments are
    disjoint and each copy zeroes foreign lanes (handles blocks straddling ANY
    number of tiles). Blocks past the forward's early-exit point were never
    written (garbage): masked out of `live` by per-tile nproc."""
    blk0 = starts // CHUNK
    t_of_o = (
        jnp.cumsum(
            jnp.zeros((nblk_out,), jnp.int32).at[obase].add(1, mode="drop")
        )
        - 1
    )  # [NBLK_OUT] owning tile of each out block (obase is sorted)
    t_safe = jnp.clip(t_of_o, 0, t - 1)
    jb = jnp.arange(nblk_out, dtype=jnp.int32) - obase[t_safe]
    inblk = blk0[t_safe] + jb
    live = (t_of_o >= 0) & (jb >= 0) & (jb < nproc[t_safe])
    return inblk, live


def _composite_core_bwd(nty, ntx, w_img, wrap_x, res, g_acc):
    inst, starts, counts, tile_ids, lt_final, nproc = res
    t = nty * ntx
    nblk_in = inst.shape[0]
    dout, obase, nblk_out = _backward_call(
        inst, starts, counts, lt_final, nproc, g_acc, nty, ntx, w_img, wrap_x
    )
    # Map tile-owned output blocks back to instance order at BLOCK granularity
    # (~20k indices instead of a K-row gather — per-index cost is what matters
    # on TPU).
    inblk, live = _out_block_map(starts, counts, obase, nproc, nblk_out, t)
    contrib = jnp.where(live[:, None, None], dout, 0.0)
    dinst = (
        jnp.zeros((nblk_in, ROWS, CHUNK), jnp.float32)
        .at[jnp.where(live, inblk, nblk_in)]
        .add(contrib, mode="drop")
    )
    return dinst, None, None, None


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


# Live-block compaction cap for the fused render backward, as a fraction of
# nblk_in: scatter cost is proportional to the STATIC cap, so keep it tight;
# overflow falls back to the exact all-blocks path via lax.cond.
_LIVE_FRAC = int(os.environ.get("SPLAT360_LIVE_CAP_DIV", "4"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7, 8, 9))
def _render_core(
    n, attrs, gidx, starts, counts, tile_ids, nty, ntx, w_img, wrap_x
):
    """Fused pack + composite with a gradient path that never touches dead rows.

    Forward: one lane gather packs attrs[ROWS, N] into [NBLK, ROWS, CHUNK]
    blocks (Gaussians stay on lanes end to end — no sublane/lane transpose
    anywhere), then the forward compositing kernel runs. Backward: the pallas
    backward produces tile-owned gradient blocks; only the LIVE ones (the
    forward processed ~17% of blocks at the north-star load) are compacted
    with block-granular gathers and scatter-added straight into per-Gaussian
    gradients — skipping both the K-row un-permute and the emission-slot
    inverse-permutation gather of the unfused path. Replaces the CUDA
    backward's atomic per-pixel accumulation (reference
    diff-gaussian-rasterization-modified, SURVEY.md §2.9)."""
    acc, _ = _render_core_fwd(
        n, attrs, gidx, starts, counts, tile_ids, nty, ntx, w_img, wrap_x
    )
    return acc


def _render_core_fwd(
    n, attrs, gidx, starts, counts, tile_ids, nty, ntx, w_img, wrap_x
):
    t = nty * ntx
    k = gidx.shape[0]
    cols = jnp.take(attrs, gidx, axis=1)  # [ROWS, K] — the one (lane) gather
    cols = jnp.where((tile_ids < t)[None, :], cols, 0.0)
    # Keep the gather and the block transpose as SEPARATE XLA ops: fused
    # together, the transpose de-vectorizes the gather (measured 13 ms for the
    # fused op vs 0.2 ms + 0.2 ms split at the north-star load).
    cols = jax.lax.optimization_barrier(cols)
    inst = cols.reshape(ROWS, k // CHUNK, CHUNK).transpose(1, 0, 2)
    acc = _composite_core_fwd_impl(inst, starts, counts, nty, ntx, w_img, wrap_x)
    planes = acc.reshape(t, 8, N_PIX)
    lt_final = planes[:, 5, :]
    nproc = planes[:, 6, 0].astype(jnp.int32)
    return acc, (inst, gidx, starts, counts, tile_ids, lt_final, nproc)


def _render_core_bwd(n, nty, ntx, w_img, wrap_x, res, g_acc):
    inst, gidx, starts, counts, tile_ids, lt_final, nproc = res
    t = nty * ntx
    nblk_in = inst.shape[0]
    dout, obase, nblk_out = _backward_call(
        inst, starts, counts, lt_final, nproc, g_acc, nty, ntx, w_img, wrap_x
    )
    inblk, live = _out_block_map(starts, counts, obase, nproc, nblk_out, t)
    gblk = gidx.reshape(nblk_in, CHUNK)
    l_cap = -(-nblk_in // _LIVE_FRAC)
    n_live = jnp.sum(live.astype(jnp.int32))

    def compact_path(dout):
        # Gather the live out-blocks (block-granular: ~n_live indices) and
        # scatter-add their lanes straight into per-Gaussian gradients. Lanes
        # outside the writing tile's segment are zero in its copy, so their
        # adds are no-ops; pad slots get index n and are dropped.
        (live_ids,) = jnp.nonzero(live, size=l_cap, fill_value=-1)
        ok = live_ids >= 0
        lid = jnp.clip(live_ids, 0, nblk_out - 1)
        dblk = dout[lid]  # [L, ROWS, CHUNK] block gather
        inb = jnp.clip(inblk[lid], 0, nblk_in - 1)
        gsel = jnp.where(ok[:, None], gblk[inb], n)  # [L, CHUNK]
        # pad blocks carry garbage lanes but all their indices are n -> dropped
        # (barrier: a transpose fused INTO the scatter de-vectorizes it — same
        # pathology as the forward pack gather, measured 27 ms fused vs <1 ms
        # split).
        dcols = dblk.transpose(1, 0, 2).reshape(ROWS, l_cap * CHUNK)
        dcols = jax.lax.optimization_barrier(dcols)
        return (
            jnp.zeros((ROWS, n), jnp.float32)
            .at[:, gsel.reshape(-1)]
            .add(dcols, mode="drop")
        )

    def full_path(dout):
        # Exact fallback when live blocks overflow the compaction cap:
        # scatter-add every out-block's lanes (same math, no compaction).
        gsel = jnp.where(
            live[:, None], gblk[jnp.clip(inblk, 0, nblk_in - 1)], n
        )
        dcols = dout.transpose(1, 0, 2).reshape(ROWS, nblk_out * CHUNK)
        dcols = jax.lax.optimization_barrier(dcols)
        return (
            jnp.zeros((ROWS, n), jnp.float32)
            .at[:, gsel.reshape(-1)]
            .add(dcols, mode="drop")
        )

    g_attrs = jax.lax.cond(n_live <= l_cap, compact_path, full_path, dout)
    return g_attrs, None, None, None, None


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def _nsub(n: int) -> int:
    """Sublane rows of the packed [NSUB, 128] attr/grad table (8-aligned)."""
    return -(-(-(-n // 8)) // 8) * 8


def _build_attrs_packed(mean2d, conic, colors, opacities, depths, radii):
    """Per-gaussian attrs as [NSUB, 128]: sublane g//8, lanes 16*(g%8)+row.

    The packed layout is what lets the fused kernels index the table with a
    single dynamic-SUBLANE access per instance (dynamic lane indexing is the
    slow direction on TPU); 8 gaussians share a sublane row so the f32
    (8, 128) VMEM tiling wastes nothing. Built with reshapes only — its
    autodiff transpose is the matching unpack, so the fused backward's
    accumulator IS this tensor's cotangent."""
    n = mean2d.shape[0]
    n_pad = _nsub(n) * 8
    pad = n_pad - n

    def p(x):
        return jnp.pad(x, (0, pad))

    cols = [
        p(mean2d[:, 0]), p(mean2d[:, 1]),
        p(conic[:, 0]), p(conic[:, 1]), p(conic[:, 2]),
        p(opacities),
        p(colors[:, 0]), p(colors[:, 1]), p(colors[:, 2]),
        p(depths),
        p(radii[:, 0]), p(radii[:, 1]),
    ]
    cols += [jnp.zeros((n_pad,), mean2d.dtype)] * (16 - len(cols))
    return jnp.stack(cols, axis=-1).reshape(_nsub(n), 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7, 8))
def _render_core_fused(
    n, attrs_packed, gidx3, starts, counts, nty, ntx, w_img, wrap_x
):
    """Fully fused render: in-kernel pack (fwd) + in-kernel grad reduce (bwd).

    Eliminates the XLA pack gather (~15 ms) and the gradient scatter pipeline
    (~34 ms) of the unfused path at the north-star load; see
    _forward_kernel_fused/_backward_kernel_fused."""
    acc, _ = _render_fused_fwd(
        n, attrs_packed, gidx3, starts, counts, nty, ntx, w_img, wrap_x
    )
    return acc


def _render_fused_fwd(
    n, attrs_packed, gidx3, starts, counts, nty, ntx, w_img, wrap_x
):
    t = nty * ntx
    nblk = gidx3.shape[0]
    nsub = attrs_packed.shape[0]
    kernel = functools.partial(
        _forward_kernel_fused, ntx=ntx, w_img=float(w_img), wrap_x=wrap_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (nsub, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (8, N_PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 128), jnp.float32),      # coll
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),  # stage (residual out)
            pltpu.VMEM((N_PIX, 8), jnp.float32),        # racc
            pltpu.VMEM((N_PIX, 1), jnp.float32),        # tacc
            pltpu.SMEM((2, 1, CHUNK), jnp.int32),       # gidx scalars
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),       # gidx vector
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc, inst = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t * 8, N_PIX), jnp.float32),
            jax.ShapeDtypeStruct((nblk, ROWS, CHUNK), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(starts, counts, gidx3, attrs_packed)
    planes = acc.reshape(t, 8, N_PIX)
    lt_final = planes[:, 5, :]
    nproc = planes[:, 6, 0].astype(jnp.int32)
    return acc, (inst, gidx3, starts, counts, lt_final, nproc, _nsub(n))


def _render_fused_bwd(n, nty, ntx, w_img, wrap_x, res, g_acc):
    inst, gidx3, starts, counts, lt_final, nproc, nsub = res
    t = nty * ntx
    kernel = functools.partial(
        _backward_kernel_fused, ntx=ntx, w_img=float(w_img), wrap_x=wrap_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (8, N_PIX), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (nsub, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),  # inst bufs
            pltpu.VMEM((N_PIX, 1), jnp.float32),        # log-T suffix
            pltpu.VMEM((N_PIX, 1), jnp.float32),        # psi suffix
            pltpu.VMEM((CHUNK, 128), jnp.float32),      # spread stage
            pltpu.SMEM((2, 1, CHUNK), jnp.int32),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    combined = g_acc.reshape(t, 8, N_PIX).at[:, 5, :].set(lt_final)
    combined = combined.reshape(t * 8, N_PIX)
    g_packed = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsub, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(starts, counts, nproc, inst, gidx3, combined)
    return g_packed, None, None, None


_render_core_fused.defvjp(_render_fused_fwd, _render_fused_bwd)

_FUSED_PACK = os.environ.get("SPLAT360_FUSED_PACK", "1") == "1"
# VMEM budget for the fused kernels' resident packed table ([NSUB, 128] f32,
# 64*N bytes): the fwd holds the attr table, the bwd the gradient accumulator,
# each next to ~1.5 MB of scratch under the 112 MB vmem_limit. Beyond the
# budget (N > ~1.47 M, e.g. 3-view 512x1024 contexts at N = 3*H*W = 1.57 M)
# the fused path would fail Mosaic VMEM allocation at compile time — fall
# back to the unfused _render_core, which keeps instance blocks in HBM and
# streams them (same outputs, ~1.5x slower at the north-star load).
_FUSED_VMEM_BUDGET = int(
    os.environ.get("SPLAT360_FUSED_VMEM_BUDGET", str(94 * 1024 * 1024))
)


def _fused_table_bytes(n: int) -> int:
    """VMEM bytes of the fused kernels' resident [NSUB, 128] f32 table."""
    return _nsub(n) * 128 * 4


def _use_fused(n: int) -> bool:
    return _FUSED_PACK and _fused_table_bytes(n) <= _FUSED_VMEM_BUDGET


def composite_tiles_pallas(
    assignment: TileAssignment,
    mean2d, conic, colors, opacities, depths, radii,
    image_shape, background, wrap_x,
):
    """Drop-in replacement for composite_tiles_jax (same outputs)."""
    h, w = image_shape
    ntx, nty = assignment.num_tiles_x, assignment.num_tiles_y
    if wrap_x and ntx < 2:
        raise ValueError(
            f"pallas compositor: equirect wrap needs width >= 2 tiles "
            f"(w={w} < {2 * TILE_W}): the kernel re-centers u per TILE, "
            f"which cannot serve both sides of the seam inside one tile. "
            f"Use the jax backend for narrow debug renders."
        )
    n = mean2d.shape[0]
    if _use_fused(n):
        attrs_p = _build_attrs_packed(
            mean2d, conic, colors, opacities, depths, radii
        )
        gidx3 = assignment.gaussian_idx.reshape(-1, 1, CHUNK)
        acc = _render_core_fused(
            n, attrs_p, gidx3, assignment.tile_starts,
            assignment.tile_counts, nty, ntx, float(w), bool(wrap_x),
        )  # [T*8, N_PIX]
    else:
        attrs = _build_attrs_t(mean2d, conic, colors, opacities, depths, radii)
        acc = _render_core(
            n, attrs, assignment.gaussian_idx, assignment.tile_starts,
            assignment.tile_counts, assignment.tile_ids, nty, ntx, float(w),
            bool(wrap_x),
        )  # [T*8, N_PIX]
    acc = acc.reshape(nty, ntx, 8, TILE_H, TILE_W)
    planes = acc.transpose(2, 0, 3, 1, 4).reshape(8, nty * TILE_H, ntx * TILE_W)
    rgb = planes[0:3, :h, :w].transpose(1, 2, 0)
    dacc = planes[3, :h, :w]
    trans = planes[4, :h, :w]
    rgb = rgb + trans[..., None] * background
    return rgb, 1.0 - trans, dacc
