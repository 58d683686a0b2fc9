"""Fresh per-stage breakdown of the r2 FUSED render path (VERDICT r2 item 1).

Times each stage of the production pipeline (_render_core_fused) at the
north-star load with the chained-fori_loop method (BASELINE.md measurement
note): each stage runs `iters` times inside ONE jit with a data dependency
feeding the previous output back into an input, so the axon tunnel's
unreliable per-dispatch sync cannot distort the number; a single scalar
readback closes the measurement.

Stages:
  proj_sh_fwd   project_erp + sh_colors forward
  bin           assign_tiles (emit + sort + segments), given projection
  attrs_packed  _build_attrs_packed ([NSUB, 128] table)
  kernel_fwd    fused pallas forward (in-kernel pack + composite)
  kernel_bwd    fused pallas backward (in-kernel grad reduce)
  epilogue      acc -> rgb/alpha/depth plane reshuffle
  proj_sh_bwd   projection + SH fwd+bwd (vjp)
  full_fb       whole render_tiled fwd+bwd (the bench.py number)

Also prints workload stats: K real instances, live-block fraction, dropped.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.geometry.transforms import cov_as_sym6
from splatter360_tpu.ops import projection as P
from splatter360_tpu.ops.tiling import assign_tiles, num_tiles
from splatter360_tpu.ops.pallas import composite as C
from splatter360_tpu.ops.rasterizer import render_tiled

H, W, SH_DEG = 512, 1024, 4
N = 2 * H * W


def chain_time(make_body, args, iters=20):
    """Time fn via a chained fori_loop inside one jit.

    make_body(args_tuple) -> (out_scalar, new_args_tuple); the scalar must
    depend on the stage output and is folded back into the args at ~1e-45
    scale so XLA cannot hoist the stage out of the loop.
    """

    @jax.jit
    def run(args):
        def body(i, a):
            return make_body(a)

        return jax.lax.fori_loop(0, iters, body, args)

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    g = random_gaussians(
        jax.random.PRNGKey(0), N, sh_degree=SH_DEG,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    means, covs, sh, op = (
        g["means"], cov_as_sym6(g["covariances"]), g["harmonics"],
        g["opacities"])  # sym6: the production gradient layout (bench.py note)
    c2w = jnp.eye(4)
    nty, ntx = num_tiles((H, W))
    t = nty * ntx

    # materialize intermediates once
    pr = jax.jit(lambda m, c: P.project_erp(m, c, c2w, (H, W), 0.1))(means, covs)
    cols3 = jax.jit(lambda s, m: P.sh_colors(s, m, c2w[:3, 3], SH_DEG))(sh, means)
    a = jax.jit(lambda p: assign_tiles(p, (H, W), True))(pr)
    attrs_p = jax.jit(C._build_attrs_packed)(
        pr.mean2d, pr.conic, cols3, op, pr.depth, pr.radius)
    gidx3 = a.gaussian_idx.reshape(-1, 1, C.CHUNK)
    nblk = gidx3.shape[0]

    acc, res = jax.jit(
        lambda ap, gi, s, cn: C._render_fused_fwd(
            N, ap, gi, s, cn, nty, ntx, float(W), True)
    )(attrs_p, gidx3, a.tile_starts, a.tile_counts)
    inst, _, _, _, lt_final, nproc, nsub = res
    g_acc = jnp.ones_like(acc)

    k_real = int(jnp.sum((a.tile_ids < t).astype(jnp.int32)))
    live_blocks = int(jnp.sum(nproc))
    print(
        f"K={a.gaussian_idx.shape[0]} (real {k_real}) nblk={nblk} "
        f"live={live_blocks} ({live_blocks / nblk:.1%}) "
        f"dropped={int(a.dropped)}",
        file=sys.stderr,
    )

    eps = jnp.float32(1e-45)

    def b_proj(ar):
        m, c, s = ar
        p = P.project_erp(m, c, c2w, (H, W), 0.1)
        cl = P.sh_colors(s, m, c2w[:3, 3], SH_DEG)
        d = (p.mean2d[0, 0] + cl[0, 0] + p.conic[0, 0] + p.depth[0]) * eps
        return (m + d, c, s)

    def b_bin(ar):
        (m2,) = ar
        p2 = P.Projected(m2, pr.conic, pr.depth, pr.radius, pr.valid)
        aa = assign_tiles(p2, (H, W), True)
        d = (aa.tile_starts[0] + aa.gaussian_idx[0]).astype(jnp.float32) * eps
        return (m2 + d,)

    def b_attrs(ar):
        (m2,) = ar
        ap = C._build_attrs_packed(m2, pr.conic, cols3, op, pr.depth, pr.radius)
        return (m2 + ap[0, 0] * eps,)

    def b_kfwd(ar):
        (ap,) = ar
        acc2, _ = C._render_fused_fwd(
            N, ap, gidx3, a.tile_starts, a.tile_counts, nty, ntx, float(W),
            True)
        return (ap + acc2[0, 0] * eps,)

    def b_kbwd(ar):
        (ga,) = ar
        gp = C._render_fused_bwd(
            N, nty, ntx, float(W), True,
            (inst, gidx3, a.tile_starts, a.tile_counts, lt_final, nproc, nsub),
            ga)[0]
        return (ga + gp[0, 0] * eps,)

    def b_epi(ar):
        (ac,) = ar
        a5 = ac.reshape(nty, ntx, 8, C.TILE_H, C.TILE_W)
        planes = a5.transpose(2, 0, 3, 1, 4).reshape(
            8, nty * C.TILE_H, ntx * C.TILE_W)
        rgb = planes[0:3, :H, :W].transpose(1, 2, 0)
        return (ac + rgb[0, 0, 0] * eps,)

    def b_projbwd(ar):
        m, c, s, o = ar

        def f(m, c, s, o):
            p = P.project_erp(m, c, c2w, (H, W), 0.1)
            cl = P.sh_colors(s, m, c2w[:3, 3], SH_DEG)
            return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(cl)
                    + jnp.sum(p.depth) + jnp.sum(o))

        gm, gc, gs, go = jax.grad(f, argnums=(0, 1, 2, 3))(m, c, s, o)
        return (m + gm[0, 0] * eps, c, s, o)

    def b_full(ar):
        m, c, s, o = ar

        def loss(m, c, s, o):
            out = render_tiled(
                m, c, s, o, c2w, (H, W), camera_kind="erp",
                backend="pallas", render_depth=False)
            return jnp.mean(out.color) + jnp.mean(out.alpha)

        gm, gc, gs, go = jax.grad(loss, argnums=(0, 1, 2, 3))(m, c, s, o)
        return (m + gm[0, 0] * eps, c, s, o)

    res_ms = {}
    res_ms["proj_sh_fwd"] = chain_time(b_proj, (means, covs, sh))
    res_ms["bin"] = chain_time(b_bin, (pr.mean2d,))
    res_ms["attrs_packed"] = chain_time(b_attrs, (pr.mean2d,))
    res_ms["kernel_fwd"] = chain_time(b_kfwd, (attrs_p,), iters=10)
    res_ms["kernel_bwd"] = chain_time(b_kbwd, (g_acc,), iters=10)
    res_ms["epilogue"] = chain_time(b_epi, (acc,))
    res_ms["proj_sh_bwd"] = chain_time(b_projbwd, (means, covs, sh, op))
    res_ms["full_fb"] = chain_time(b_full, (means, covs, sh, op), iters=10)

    for name, ms in res_ms.items():
        print(f"{name:14s} {ms:8.2f} ms")
    ssum = sum(v for k, v in res_ms.items() if k != "full_fb")
    print(f"{'SUM(stages)':14s} {ssum:8.2f} ms")
    print(f"full_fb -> {H * W / res_ms['full_fb'] / 1e3:.2f} Mpx/s")
    print(json.dumps({"stages_ms": {k: round(v, 2) for k, v in res_ms.items()},
                      "k_real": k_real, "nblk": nblk,
                      "live_blocks": live_blocks,
                      "live_frac": round(live_blocks / nblk, 4)}))


if __name__ == "__main__":
    main()
