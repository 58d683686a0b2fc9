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

The backward re-walks chunks in reverse, recomputing alpha/E and carrying suffix
accumulators; per-instance gradients are direct derivatives of the power form
(sublane reductions) plus MXU matmuls for the color/gamma terms — mirroring the CUDA
backward's math. They scatter-add into per-Gaussian gradients outside via the
autograd transpose of the instance gather.

Memory layout (tuned around TPU per-index costs — see ops/tiling.py): instances are
packed once per frame with a SINGLE row gather (attrs[N, 16] -> rows[K, 16]) into
contiguous [NBLK, ROWS, CHUNK] blocks. Tile segments stay UNALIGNED; the kernels walk
whole 128-instance blocks with per-lane segment masks (boundary blocks are shared by
adjacent tiles — harmless on the read side). The backward writes each tile's
per-block gradients into tile-OWNED output blocks (offsets from a tiny cumsum), so
there are no write conflicts; a host-side gather maps them back to instance order.
Input DMAs are double-buffered; gradient write-backs are pipelined one chunk behind.
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

from ..tiling import BLOCK, TILE_H, TILE_W, TileAssignment

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


def _contract(a, b, axes):
    # HIGHEST: full-f32 MXU passes — the log-prefix sums and color accumulation
    # need f32 mantissas (default bf16 passes cost ~4e-3 relative error).
    return jax.lax.dot_general(
        a, b, dimension_numbers=(axes, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


def _chunk_alpha(data, px, py, w_img, wrap_x):
    """Per-instance alpha maps for one chunk (pixels-major).

    data: [ROWS, CHUNK]; px, py: [N_PIX, 1].
    Returns (alpha, dx, dy, a, b, c, o) — alpha/dx/dy [N_PIX, CHUNK],
    scalars [1, CHUNK].
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
    return alpha, dx, dy, a, b, c, o


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

    def body(j, n_processed):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            in_copy(1 - slot, j + 1).start()

        in_copy(slot, j).wait()

        # Once every pixel in the tile saturates, skip the remaining blocks
        # permanently (tacc is frozen, so `live` stays False). The count of
        # processed blocks is exported so the backward can telescope its
        # suffix over exactly the blocks the forward accumulated.
        live = (jnp.max(tacc[:]) >= _LOG_T_EPS) if _EARLY_EXIT else (j >= 0)

        @pl.when(live)
        def _():
            data = jnp.where(_segment_mask(blk0, j, start, count), bufs[slot], 0.0)

            alpha, *_ = _chunk_alpha(data, px, py, w_img, wrap_x)
            lg = jnp.log1p(-alpha)
            e = _contract(lg, mup, ((1,), (0,)))  # exclusive prefix over chunk
            # T carried in log space: never underflows, and the backward can
            # reconstruct per-block T by exact telescoping of the log sums.
            t_i = jnp.exp(tacc[:] + e)
            # unmasked T decay + post-decay contribution gate (see rasterizer_ref)
            w = jnp.where(t_i * (1.0 - alpha) >= _T_EPS, alpha * t_i, 0.0)

            cd = data[6:10, :]  # [4, CHUNK]: r g b depth
            racc[:, 0:4] = racc[:, 0:4] + _contract(w, cd, ((1,), (1,)))
            tacc[:] = tacc[:] + jnp.sum(lg, axis=1, keepdims=True)

        return n_processed + live.astype(jnp.int32)

    n_processed = jax.lax.fori_loop(0, n_blocks, body, jnp.int32(0))

    planes = jnp.concatenate(
        [racc[:, 0:4], jnp.exp(tacc[:]), tacc[:],
         jnp.full((N_PIX, 1), n_processed.astype(jnp.float32)),
         jnp.zeros((N_PIX, 1), jnp.float32)], axis=1
    )  # r g b depth T logT n_processed 0
    acc_ref[:] = planes.T  # one [N_PIX, 8] -> [8, N_PIX] transpose per tile


def _backward_kernel(
    starts_ref, counts_ref, obase_ref, nproc_ref,
    inst_ref,                # HBM [NBLK, ROWS, CHUNK]
    gacc_ref,                # [8, N_PIX]: gr gg gb gdepth gT T_final 0 0
    dout_ref,                # out HBM [NBLK_OUT, ROWS, CHUNK] tile-owned blocks
    bufs, grad_bufs, psum_scratch, slg_scratch, sems, out_sems,
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

    mup = _strict_upper(jnp.float32)
    mlow = _strict_lower(jnp.float32)

    lt_final = gacc_ref[5:6, :].T    # [N_PIX, 1] log T_final (exact, no clamping)
    g_rgbd = gacc_ref[0:4, :]        # [4, N_PIX]
    gt_term = (gacc_ref[4:5, :] * jnp.exp(gacc_ref[5:6, :])).T  # g_T * T_final

    def in_copy(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[blk0 + j], bufs.at[slot], sems.at[slot]
        )

    def out_copy(slot, j):
        return pltpu.make_async_copy(
            grad_bufs.at[slot], dout_ref.at[obase + j], out_sems.at[slot]
        )

    @pl.when(n_blocks > 0)
    def _():
        in_copy(0, n_blocks - 1).start()

    def body(rj, carry):
        log_t_suffix, a_psi = carry  # [N_PIX, 1] each
        j = n_blocks - 1 - rj
        slot = jax.lax.rem(rj, 2)

        @pl.when(rj + 1 < n_blocks)
        def _():
            in_copy(1 - slot, j - 1).start()

        in_copy(slot, j).wait()
        # wait for the grad write-back that used this slot two chunks ago
        @pl.when(rj >= 2)
        def _():
            out_copy(slot, j + 2).wait()

        psum_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)
        slg_scratch[:] = jnp.zeros((N_PIX, 1), jnp.float32)
        grad_bufs[slot] = jnp.zeros((ROWS, CHUNK), jnp.float32)

        # Blocks the forward early-exited (j >= nproc) had exactly zero weight
        # and zero effect on the outputs: no gradients, their absorbance must
        # not enter the telescoping suffix (lt_final excludes them), and all
        # the alpha math can be skipped wholesale.
        @pl.when(j < nproc)
        def _():
            data = jnp.where(
                _segment_mask(blk0, j, start, count), bufs[slot], 0.0
            )
            alpha, dx, dy, a, b, c, o = _chunk_alpha(data, px, py, w_img, wrap_x)
            lg = jnp.log1p(-alpha)
            sum_lg = jnp.sum(lg, axis=1, keepdims=True)
            # T at block end/start from the full (unmasked) decay — no fixed
            # point.
            log_t_end = lt_final - log_t_suffix
            log_t_start = log_t_end - sum_lg
            slg_scratch[:] = sum_lg

            # Skip the gradient math when every pixel was already saturated
            # before this (deeper) block: t <= t_start < eps => nothing here.
            @pl.when(jnp.max(log_t_start) >= _LOG_T_EPS)
            def _():
                e = _contract(lg, mup, ((1,), (0,)))
                t_i = jnp.exp(log_t_start + e)
                contrib = t_i * (1.0 - alpha) >= _T_EPS
                w = jnp.where(contrib, alpha * t_i, 0.0)

                cd = data[6:10, :]  # [4, CHUNK]
                # gamma[p, k] = c_k . g_rgbd(p) + d_k g_depth(p)  (MXU)
                gamma = _contract(g_rgbd, cd, ((0,), (0,)))  # [N_PIX, CHUNK]
                psi = w * gamma
                # suffix[p, k] = sum_{j>k} psi[p, j]  (psi @ strict_lower, MXU)
                suffix = _contract(psi, mlow, ((1,), (0,)))

                g_alpha = t_i * gamma - (suffix + a_psi + gt_term) / (1.0 - alpha)
                g_alpha = jnp.where(contrib, g_alpha, 0.0)
                # d alpha / d power = alpha below the 0.99 cap (as CUDA)
                g_p = g_alpha * alpha  # [N_PIX, CHUNK]

                # color/depth grads: dL/dcd[c,k] = sum_p g_rgbd[c,p] w[p,k]
                g_cd = _contract(g_rgbd, w, ((1,), (0,)))  # [4, CHUNK]
                g_o = jnp.sum(g_p, axis=0, keepdims=True) / jnp.maximum(o, 1e-12)

                # direct derivatives of the power form (sublane reductions)
                g_a = jnp.sum(g_p * (-0.5 * dx * dx), axis=0, keepdims=True)
                g_b = jnp.sum(g_p * (-dx * dy), axis=0, keepdims=True)
                g_c = jnp.sum(g_p * (-0.5 * dy * dy), axis=0, keepdims=True)
                g_u = jnp.sum(g_p * (a * dx + b * dy), axis=0, keepdims=True)
                g_v = jnp.sum(g_p * (c * dy + b * dx), axis=0, keepdims=True)

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
                psum_scratch[:] = jnp.sum(psi, axis=1, keepdims=True)

        out_copy(slot, j).start()

        return (
            log_t_suffix + slg_scratch[:],
            a_psi + psum_scratch[:],
        )

    init = (
        jnp.zeros((N_PIX, 1), jnp.float32),
        jnp.zeros((N_PIX, 1), jnp.float32),
    )
    jax.lax.fori_loop(0, n_blocks, body, init)

    # drain the last (up to two) in-flight grad write-backs
    @pl.when(n_blocks >= 1)
    def _():
        out_copy(jax.lax.rem(n_blocks - 1, 2), 0).wait()

    @pl.when(n_blocks >= 2)
    def _():
        out_copy(jax.lax.rem(n_blocks - 2, 2), 1).wait()


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _pack_instances(
    assignment, mean2d, conic, colors, opacities, depths, radii
):
    """Pack per-instance attributes as contiguous [NBLK, ROWS, CHUNK].

    One elementwise attrs build + ONE row gather (the per-index cost dominates on
    TPU, so everything else is arithmetic)."""
    n = mean2d.shape[0]
    t_total = assignment.num_tiles_x * assignment.num_tiles_y
    attrs = jnp.stack(
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
    rows = attrs[assignment.gaussian_idx]  # [K, ROWS] — the one gather
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
    acc = pl.pallas_call(
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


def _composite_core_bwd(nty, ntx, w_img, wrap_x, res, g_acc):
    inst, starts, counts, tile_ids, lt_final, nproc = res
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
            pltpu.VMEM((N_PIX, 1), jnp.float32),  # psi suffix-sum carry
            pltpu.VMEM((N_PIX, 1), jnp.float32),  # sum_lg of the current block
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # fold log T_final into plane 5 of the gradient planes so a single aligned
    # (8, N_PIX) block carries both. (The forward's logT output plane is not a
    # differentiable output — its cotangent slot is overwritten here.)
    combined = g_acc.reshape(t, 8, N_PIX).at[:, 5, :].set(lt_final)
    combined = combined.reshape(t * 8, N_PIX)
    dout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk_out, ROWS, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(starts, counts, obase, nproc, inst, combined)

    # map tile-owned output blocks back to instance order:
    #   opos(p) = p + (obase[tile] - blk0[tile]) * CHUNK
    blk0 = starts // CHUNK
    oshift = (obase - blk0) * CHUNK  # [T]
    valid = tile_ids < t
    tid_safe = jnp.where(valid, tile_ids, 0)
    p = jnp.arange(nblk_in * CHUNK, dtype=jnp.int32)
    opos = p + oshift[tid_safe]  # small-table gather
    out_rows = dout.transpose(0, 2, 1).reshape(nblk_out * CHUNK, ROWS)
    dinst_rows = out_rows[jnp.clip(opos, 0, nblk_out * CHUNK - 1)]
    dinst_rows = jnp.where(valid[:, None], dinst_rows, 0.0)
    dinst = dinst_rows.reshape(nblk_in, CHUNK, ROWS).transpose(0, 2, 1)
    return dinst, None, None, None


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


def composite_tiles_pallas(
    assignment: TileAssignment,
    mean2d, conic, colors, opacities, depths, radii,
    image_shape, background, wrap_x,
):
    """Drop-in replacement for composite_tiles_jax (same outputs)."""
    h, w = image_shape
    ntx, nty = assignment.num_tiles_x, assignment.num_tiles_y
    inst = _pack_instances(
        assignment, mean2d, conic, colors, opacities, depths, radii
    )
    acc = _composite_core(
        inst, assignment.tile_starts, assignment.tile_counts,
        assignment.tile_ids, nty, ntx, float(w), bool(wrap_x),
    )  # [T*8, N_PIX]
    acc = acc.reshape(nty, ntx, 8, TILE_H, TILE_W)
    planes = acc.transpose(2, 0, 3, 1, 4).reshape(8, nty * TILE_H, ntx * TILE_W)
    rgb = planes[0:3, :h, :w].transpose(1, 2, 0)
    dacc = planes[3, :h, :w]
    trans = planes[4, :h, :w]
    rgb = rgb + trans[..., None] * background
    return rgb, 1.0 - trans, dacc
