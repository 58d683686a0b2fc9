"""Per-stage breakdown of ONE supervision cube-face render at hm3d scale.

TRAINBENCH.json shows the v*6 face renders are ~70% of the train step
(decoder_fb 2359 ms of 3385); this decomposes one 256x256 pinhole face over
N=1.05M gaussians (the exact per-face workload of render_cube_views) with
the chained-timing method, so the train-step optimization attacks the right
stage. Stages mirror scripts/bench_fused_r3.py.

Usage: python scripts/bench_face_render.py   (TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from splatter360_tpu.data.synthetic import random_gaussians  # noqa: E402
from splatter360_tpu.geometry.cubemap import (  # noqa: E402
    cube_face_extrinsics, cube_face_intrinsics,
)
from splatter360_tpu.geometry.transforms import cov_as_sym6  # noqa: E402
from splatter360_tpu.ops import projection as P  # noqa: E402
from splatter360_tpu.ops.rasterizer import render_tiled  # noqa: E402
from splatter360_tpu.ops.tiling import assign_tiles  # noqa: E402

H_SRC, W_SRC, SH_DEG = 512, 1024, 4
N = 2 * H_SRC * W_SRC
FACE = 256


def chain_time(make_body, args, iters=10):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, iters, lambda i, x: make_body(x), a)

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    g = random_gaussians(
        jax.random.PRNGKey(0), N, sh_degree=SH_DEG,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    means, sh, op = g["means"], g["harmonics"], g["opacities"]
    covs = cov_as_sym6(g["covariances"])
    c2w = cube_face_extrinsics(jnp.eye(4)[None, None])[0, 0, 2]
    intr = cube_face_intrinsics(jnp.float32)
    eps = jnp.float32(1e-45)

    res = {}

    def b_proj(a):
        (m,) = a
        pr = P.project_pinhole(m, covs, c2w, intr, (FACE, FACE), 0.1,
                               opacities=op)
        return (m + pr.mean2d[0, 0] * eps,)

    res["proj_fwd"] = chain_time(b_proj, (means,))

    def b_sh(a):
        (s,) = a
        cols = P.sh_colors(s, means, c2w[:3, 3], SH_DEG)
        return (s + cols[0, 0] * eps,)

    res["sh_fwd"] = chain_time(b_sh, (sh,))

    pr = jax.jit(lambda m: P.project_pinhole(
        m, covs, c2w, intr, (FACE, FACE), 0.1, opacities=op))(means)

    def b_bin(a):
        (d,) = a
        asg = assign_tiles(pr._replace(depth=d), (FACE, FACE), False,
                           instance_cap=max(N, 4096))
        return (d + asg.tile_counts[0] * eps,)

    res["bin"] = chain_time(b_bin, (pr.depth,))

    def full(m, c, s, o):
        out = render_tiled(
            m, c, s, o, c2w, (FACE, FACE), camera_kind="pinhole",
            intrinsics=intr, near=0.1, backend="pallas",
            instance_cap=max(N, 4096),
        )
        return out

    def b_fwd(a):
        m, c, s, o = a
        out = full(m, c, s, o)
        return (m + out.color[0, 0, 0] * eps, c, s, o)

    res["full_fwd"] = chain_time(b_fwd, (means, covs, sh, op))

    gfn = jax.grad(
        lambda m, c, s, o: jnp.mean(full(m, c, s, o).color ** 2)
        + 0.1 * jnp.mean(full(m, c, s, o).alpha), argnums=(0, 1, 2, 3))

    def loss(m, c, s, o):
        out = full(m, c, s, o)
        return jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)

    gfn = jax.grad(loss, argnums=(0, 1, 2, 3))

    def b_fb(a):
        m, c, s, o = a
        gm, gc, gs, go = gfn(m, c, s, o)
        return (m + gm[0, 0] * eps, c, s, o)

    res["full_fwd_bwd"] = chain_time(b_fb, (means, covs, sh, op), iters=6)

    # remat variant: what the training loop actually runs per face
    loss_r = jax.checkpoint(loss)
    gfn_r = jax.grad(loss_r, argnums=(0, 1, 2, 3))

    def b_fb_r(a):
        m, c, s, o = a
        gm, gc, gs, go = gfn_r(m, c, s, o)
        return (m + gm[0, 0] * eps, c, s, o)

    res["full_fwd_bwd_remat"] = chain_time(b_fb_r, (means, covs, sh, op),
                                           iters=6)

    for k, v in res.items():
        print(f"{k:20s} {v:8.2f} ms", file=sys.stderr)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))




def encoder_probe():
    """Re-run the face fwd+bwd breakdown on gaussians the INIT encoder
    actually emits (the training-time distribution), plus live-block stats —
    explains the gap between this file's synthetic numbers and
    TRAINBENCH.json's decoder_fb (early exit depends on opacity/scale
    distributions, which differ wildly between a converged-looking synthetic
    scene and an untrained model)."""
    from __graft_entry__ import _make_batch
    from splatter360_tpu.config import load_config
    from splatter360_tpu.train.state import _context_cubes, create_train_state
    from splatter360_tpu.train.losses import LossConfig  # noqa: F401
    from splatter360_tpu.ops.pallas import composite as C

    cfg = load_config("configs/hm3d.yaml", [])
    batch = _make_batch(1, 2, H_SRC, W_SRC)
    state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train,
                               batch)
    ctx = jax.tree_util.tree_map(jnp.asarray, batch["context"])
    cubes = _context_cubes(ctx["image_sphere"], H_SRC // 2)
    gaussians, _ = jax.jit(lambda p: state.apply_fn(
        p, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
        ctx["near"], ctx["far"], 0))(state.params)
    m = gaussians.means[0]
    c = gaussians.covariances[0]
    s = gaussians.harmonics[0]
    o = gaussians.opacities[0]
    print(f"encoder gaussians: N={m.shape[0]} "
          f"op[min/med/max]={float(jnp.min(o)):.4f}/"
          f"{float(jnp.median(o)):.4f}/{float(jnp.max(o)):.4f}",
          file=sys.stderr)

    c2w = cube_face_extrinsics(jnp.eye(4)[None, None])[0, 0, 2]
    intr = cube_face_intrinsics(jnp.float32)
    n = m.shape[0]

    # live-block stats through the fused fwd internals
    pr = jax.jit(lambda mm: P.project_pinhole(
        mm, c, c2w, intr, (FACE, FACE), 0.1, opacities=o))(m)
    asg = jax.jit(lambda p: assign_tiles(p, (FACE, FACE), False,
                                         instance_cap=max(n, 4096)))(pr)
    k_real = int(jnp.sum(asg.tile_counts))
    nblk = asg.gaussian_idx.shape[0] // 128
    cols3 = jax.jit(lambda ss, mm: P.sh_colors(ss, mm, c2w[:3, 3],
                                               cfg.model.gaussian_adapter.sh_degree))(s, m)
    attrs_p = jax.jit(C._build_attrs_packed)(
        pr.mean2d, pr.conic, cols3, o, pr.depth, pr.radius)
    gidx3 = asg.gaussian_idx.reshape(-1, 1, C.CHUNK)
    from splatter360_tpu.ops.tiling import num_tiles
    nty, ntx = num_tiles((FACE, FACE))
    acc, res2 = jax.jit(lambda ap, gi, st, cn: C._render_fused_fwd(
        n, ap, gi, st, cn, nty, ntx, float(FACE), False)
    )(attrs_p, gidx3, asg.tile_starts, asg.tile_counts)
    nproc = res2[5]
    print(f"face workload: K_real={k_real} nblk={nblk} "
          f"walked={int(jnp.sum(nproc))} "
          f"({float(jnp.sum(nproc)) / max(nblk, 1):.1%} incl. shared "
          f"boundary blocks)", file=sys.stderr)

    eps = jnp.float32(1e-45)

    def loss(mm, cc, ss, oo):
        out = render_tiled(
            mm, cc, ss, oo, c2w, (FACE, FACE), camera_kind="pinhole",
            intrinsics=intr, near=0.1, backend="pallas",
            instance_cap=max(n, 4096),
        )
        return jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)

    gfn = jax.grad(loss, argnums=(0, 1, 2, 3))

    def b_fb(a):
        mm, cc, ss, oo = a
        gm, _, _, _ = gfn(mm, cc, ss, oo)
        return (mm + gm[0, 0] * eps, cc, ss, oo)

    ms = chain_time(b_fb, (m, c, s, o), iters=4)
    print(f"encoder-gaussians face fwd+bwd: {ms:.2f} ms", file=sys.stderr)
    print(json.dumps({"encoder_face_fwd_bwd_ms": round(ms, 2),
                      "k_real": k_real, "walked_blocks": int(jnp.sum(nproc)),
                      "nblk": nblk}))




def decoder_probe():
    """Time the EXACT training decoder call (render_cube_views, 12 faces,
    sequential lax.map + per-face remat) fwd+bwd on encoder-init gaussians,
    vs 12x the single-face cost — isolates the map/remat machinery tax."""
    from __graft_entry__ import _make_batch
    from splatter360_tpu.config import load_config
    from splatter360_tpu.models.decoder import render_cube_views
    from splatter360_tpu.train.state import _context_cubes, create_train_state

    cfg = load_config("configs/hm3d.yaml", [])
    batch = _make_batch(1, 2, H_SRC, W_SRC)
    state = create_train_state(jax.random.PRNGKey(0), cfg.model, cfg.train,
                               batch)
    ctx = jax.tree_util.tree_map(jnp.asarray, batch["context"])
    tgt = jax.tree_util.tree_map(jnp.asarray, batch["target"])
    cubes = _context_cubes(ctx["image_sphere"], H_SRC // 2)
    gaussians, _ = jax.jit(lambda p: state.apply_fn(
        p, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
        ctx["near"], ctx["far"], 0))(state.params)
    eps = jnp.float32(1e-45)

    def dec_loss(g, sequential, remat):
        out = render_cube_views(
            g, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (FACE, FACE), backend="pallas",
            max_per_tile=cfg.train.max_per_tile,
            sequential=sequential, remat_faces=remat,
        )
        return jnp.mean(out.color ** 2)

    res = {}
    import itertools
    variants = [("seq_remat", True, True), ("seq_norremat", True, False),
                ("unroll_remat", "unroll", True),
                ("unroll_noremat", "unroll", False)]
    if "--quick" in sys.argv:
        variants = variants[2:]
    for label, seq, rem in variants:
        gfn = jax.grad(lambda g: dec_loss(g, seq, rem))

        def b(a):
            (g,) = a
            gr = gfn(g)
            return (g._replace(means=g.means + gr.means[0, 0, 0] * eps),)

        try:
            res[label] = round(chain_time(b, (gaussians,), iters=3), 1)
            print(f"decoder fwd+bwd [{label}]: {res[label]} ms",
                  file=sys.stderr)
        except Exception as e:
            res[label] = f"failed: {type(e).__name__}"
            print(f"decoder fwd+bwd [{label}] failed: {e}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    if "--decoder" in sys.argv:
        decoder_probe()
    elif "--encoder" in sys.argv:
        encoder_probe()
    else:
        main()
