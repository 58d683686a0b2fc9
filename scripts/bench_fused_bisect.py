"""Bisect the fused kernels' per-block cost via trace-time ablations.

The ablation sets (_FWD_ABLATE/_ABLATE in ops/pallas/composite.py) are read
at TRACE time, so one process sweeps every config by mutating the module
variables between jits. Early exit is DISABLED for the whole sweep: several
ablations corrupt the data the exit predicate reads (e.g. "collect" leaves
garbage alpha -> transmittance never saturates), which would change the
block count and make timings incomparable. With EARLY_EXIT off every config
walks the same n_blocks, so deltas are pure per-stage cost; scale by the
live fraction (~12%, scripts/bench_fused_r3.py) for the production regime.

Ablated runs compute WRONG outputs — timing only. Measurement uses the
chained-fori_loop method (BASELINE.md note on axon tunnel timing).

  python scripts/bench_fused_bisect.py [fwd|bwd|both]
"""

import json
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

FWD_ABLATIONS = ["", "collect", "unpack", "residual", "mxu", "alpha",
                 "collect,unpack,residual,mxu,alpha"]
BWD_ABLATIONS = ["", "rmw", "spread", "gamma", "suffix", "moment",
                 "rmw,spread,gamma,suffix,moment"]


def chain_time(make_body, args, iters=5):
    @jax.jit
    def run(args):
        return jax.lax.fori_loop(0, iters, lambda i, a: make_body(a), args)

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    C._EARLY_EXIT = False  # constant block count across ablations (see module doc)
    g = random_gaussians(
        jax.random.PRNGKey(0), N, sh_degree=SH_DEG,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    means, covs, sh, op = (
        g["means"], g["covariances"], g["harmonics"], g["opacities"])
    c2w = jnp.eye(4)
    nty, ntx = num_tiles((H, W))

    pr = jax.jit(lambda m, c: P.project_erp(m, c, c2w, (H, W), 0.1))(means, covs)
    cols3 = jax.jit(lambda s, m: P.sh_colors(s, m, c2w[:3, 3], SH_DEG))(sh, means)
    a = jax.jit(lambda p: assign_tiles(p, (H, W), True))(pr)
    attrs_p = jax.jit(C._build_attrs_packed)(
        pr.mean2d, pr.conic, cols3, op, pr.depth, pr.radius)
    gidx3 = a.gaussian_idx.reshape(-1, 1, C.CHUNK)

    acc, res = jax.jit(
        lambda ap, gi, s, cn: C._render_fused_fwd(
            N, ap, gi, s, cn, nty, ntx, float(W), True)
    )(attrs_p, gidx3, a.tile_starts, a.tile_counts)
    inst, _, _, _, lt_final, nproc, nsub = res
    g_acc = jnp.ones_like(acc)
    eps = jnp.float32(1e-45)
    print(f"nblk={gidx3.shape[0]} walked_blocks={int(jnp.sum(nproc))}",
          file=sys.stderr, flush=True)

    results = {}
    if mode in ("fwd", "both"):
        for ab in FWD_ABLATIONS:
            C._FWD_ABLATE = frozenset(x for x in ab.split(",") if x)

            def b_kfwd(ar):
                (ap,) = ar
                acc2, _ = C._render_fused_fwd(
                    N, ap, gidx3, a.tile_starts, a.tile_counts, nty, ntx,
                    float(W), True)
                return (ap + acc2[0, 0] * eps,)

            ms = chain_time(b_kfwd, (attrs_p,))
            results[f"fwd:{ab or 'none'}"] = round(ms, 2)
            print(f"BISECT fwd  ablate={ab or '-':40s} {ms:8.2f} ms",
                  flush=True)
        C._FWD_ABLATE = frozenset()

    if mode in ("bwd", "both"):
        for ab in BWD_ABLATIONS:
            C._ABLATE = frozenset(x for x in ab.split(",") if x)

            def b_kbwd(ar):
                (ga,) = ar
                gp = C._render_fused_bwd(
                    N, nty, ntx, float(W), True,
                    (inst, gidx3, a.tile_starts, a.tile_counts, lt_final,
                     nproc, nsub),
                    ga)[0]
                return (ga + gp[0, 0] * eps,)

            ms = chain_time(b_kbwd, (g_acc,))
            results[f"bwd:{ab or 'none'}"] = round(ms, 2)
            print(f"BISECT bwd  ablate={ab or '-':40s} {ms:8.2f} ms",
                  flush=True)
        C._ABLATE = frozenset()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
