"""Micro-decomposition of the FUSED production render path (_render_core).

bench_breakdown.py times whole stages; this script times the individual ops
inside _render_core fwd/bwd at the north-star load so optimization targets the
real cost, not a guess. Run on the TPU (ambient JAX_PLATFORMS=axon).

Pieces (fwd): project, sh, bin (assign_tiles given proj), attrs build,
pack gather (take+mask), block transpose, pallas fwd kernel, acc epilogue.
Pieces (bwd): pallas bwd kernel, out-block map + nonzero, block gather,
transpose, scatter-add into [ROWS, N], attrs-unbuild.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops import projection as P
from splatter360_tpu.ops.tiling import assign_tiles, num_tiles
from splatter360_tpu.ops.pallas import composite as C

H, W, SH_DEG = 512, 1024, 4
N = 2 * H * W


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    g = random_gaussians(
        jax.random.PRNGKey(0), N, sh_degree=SH_DEG,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    means, covs, sh, op = (
        g["means"], g["covariances"], g["harmonics"], g["opacities"])
    c2w = jnp.eye(4)
    nty, ntx = num_tiles((H, W))
    t = nty * ntx

    # --- materialize intermediates once ---
    pr = jax.jit(lambda m, c: P.project_erp(m, c, c2w, (H, W), 0.1))(means, covs)
    cols3 = jax.jit(lambda s, m: P.sh_colors(s, m, c2w[:3, 3], SH_DEG))(sh, means)
    a = jax.jit(lambda p: assign_tiles(p, (H, W), True))(pr)
    attrs = jax.jit(C._build_attrs_t)(
        pr.mean2d, pr.conic, cols3, op, pr.depth, pr.radius)
    k = a.gaussian_idx.shape[0]
    nblk_in = k // C.CHUNK
    print(f"K={k} nblk_in={nblk_in} T={t}", file=sys.stderr)

    @jax.jit
    def f_project(m, c):
        p = P.project_erp(m, c, c2w, (H, W), 0.1)
        return p.mean2d, p.conic, p.depth, p.radius, p.valid

    @jax.jit
    def f_sh(s, m):
        return P.sh_colors(s, m, c2w[:3, 3], SH_DEG)

    @jax.jit
    def f_bin(p):
        aa = assign_tiles(p, (H, W), True)
        return aa.gaussian_idx, aa.tile_starts, aa.tile_counts, aa.tile_ids

    @jax.jit
    def f_attrs(m2, cn, cl, o, d, r):
        return C._build_attrs_t(m2, cn, cl, o, d, r)

    @jax.jit
    def f_gather(attrs, gidx, tile_ids):
        cols = jnp.take(attrs, gidx, axis=1)
        return jnp.where((tile_ids < t)[None, :], cols, 0.0)

    cols = jax.block_until_ready(f_gather(attrs, a.gaussian_idx, a.tile_ids))

    @jax.jit
    def f_transpose(cols):
        return cols.reshape(C.ROWS, k // C.CHUNK, C.CHUNK).transpose(1, 0, 2)

    inst = jax.block_until_ready(f_transpose(cols))

    @jax.jit
    def f_kernel_fwd(inst, starts, counts):
        return C._composite_core_fwd_impl(inst, starts, counts, nty, ntx,
                                          float(W), True)

    acc = jax.block_until_ready(f_kernel_fwd(inst, a.tile_starts, a.tile_counts))

    @jax.jit
    def f_epilogue(acc):
        a5 = acc.reshape(nty, ntx, 8, C.TILE_H, C.TILE_W)
        planes = a5.transpose(2, 0, 3, 1, 4).reshape(8, nty * C.TILE_H,
                                                     ntx * C.TILE_W)
        rgb = planes[0:3, :H, :W].transpose(1, 2, 0)
        return rgb + (planes[4, :H, :W])[..., None] * jnp.zeros((3,))

    planes = acc.reshape(t, 8, C.N_PIX)
    lt_final = jax.block_until_ready(planes[:, 5, :])
    nproc = jax.block_until_ready(planes[:, 6, 0].astype(jnp.int32))
    g_acc = jnp.ones_like(acc)

    @jax.jit
    def f_kernel_bwd(inst, starts, counts, lt_final, nproc, g_acc):
        dout, obase, nblk_out = C._backward_call(
            inst, starts, counts, lt_final, nproc, g_acc, nty, ntx,
            float(W), True)
        return dout

    dout = jax.block_until_ready(
        f_kernel_bwd(inst, a.tile_starts, a.tile_counts, lt_final, nproc, g_acc))
    obase, nblk_out = C._out_block_layout(a.tile_starts, a.tile_counts, nblk_in)
    obase = jax.block_until_ready(obase)
    l_cap = -(-nblk_in // C._LIVE_FRAC)

    @jax.jit
    def f_blockmap(starts, counts, obase, nproc):
        inblk, live = C._out_block_map(starts, counts, obase, nproc,
                                       nblk_out, t)
        (live_ids,) = jnp.nonzero(live, size=l_cap, fill_value=-1)
        return inblk, live, live_ids

    inblk, live, live_ids = jax.block_until_ready(
        f_blockmap(a.tile_starts, a.tile_counts, obase, nproc))
    gblk = a.gaussian_idx.reshape(nblk_in, C.CHUNK)

    @jax.jit
    def f_blockgather(dout, live_ids, inblk, gblk):
        ok = live_ids >= 0
        lid = jnp.clip(live_ids, 0, nblk_out - 1)
        dblk = dout[lid]
        inb = jnp.clip(inblk[lid], 0, nblk_in - 1)
        gsel = jnp.where(ok[:, None], gblk[inb], N)
        return dblk, gsel

    dblk, gsel = jax.block_until_ready(
        f_blockgather(dout, live_ids, inblk, gblk))

    @jax.jit
    def f_dtranspose(dblk):
        return dblk.transpose(1, 0, 2).reshape(C.ROWS, l_cap * C.CHUNK)

    dcols = jax.block_until_ready(f_dtranspose(dblk))

    @jax.jit
    def f_scatter(dcols, gsel):
        return (jnp.zeros((C.ROWS, N), jnp.float32)
                .at[:, gsel.reshape(-1)].add(dcols, mode="drop"))

    @jax.jit
    def f_proj_bwd(m, c, s, o):
        def f(m, c, s, o):
            p = P.project_erp(m, c, c2w, (H, W), 0.1)
            cl = P.sh_colors(s, m, c2w[:3, 3], SH_DEG)
            return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(cl)
                    + jnp.sum(p.depth) + jnp.sum(o))
        return jax.grad(f, argnums=(0, 1, 2, 3))(m, c, s, o)

    n_live = int(jnp.sum(live.astype(jnp.int32)))
    print(f"n_live={n_live} l_cap={l_cap} nblk_out={nblk_out}", file=sys.stderr)

    res = {
        "project_fwd": timeit(f_project, means, covs),
        "sh_fwd": timeit(f_sh, sh, means),
        "bin_given_proj": timeit(f_bin, pr),
        "attrs_build": timeit(f_attrs, pr.mean2d, pr.conic, cols3, op,
                              pr.depth, pr.radius),
        "pack_gather": timeit(f_gather, attrs, a.gaussian_idx, a.tile_ids),
        "pack_transpose": timeit(f_transpose, cols),
        "kernel_fwd": timeit(f_kernel_fwd, inst, a.tile_starts, a.tile_counts),
        "epilogue": timeit(f_epilogue, acc),
        "kernel_bwd": timeit(f_kernel_bwd, inst, a.tile_starts, a.tile_counts,
                             lt_final, nproc, g_acc),
        "blockmap+nonzero": timeit(f_blockmap, a.tile_starts, a.tile_counts,
                                   obase, nproc),
        "block_gather": timeit(f_blockgather, dout, live_ids, inblk, gblk),
        "d_transpose": timeit(f_dtranspose, dblk),
        "scatter_add": timeit(f_scatter, dcols, gsel),
        "proj+sh_fwd_bwd": timeit(f_proj_bwd, means, covs, sh, op),
    }
    for name, ms in res.items():
        print(f"{name:18s} {ms:8.2f} ms")
    print(f"{'SUM':18s} {sum(res.values()):8.2f} ms  (full_fb measured ~88)")


if __name__ == "__main__":
    main()
