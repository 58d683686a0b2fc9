"""Per-stage timing of the rasterizer pipeline at the north-star workload.

Times (on the real TPU; JAX_PLATFORMS=axon is ambient):
  project      project_erp + sh_colors, fwd
  tiles        assign_tiles (emit + sort + searchsorted)
  pack         _pack_instances row gather
  kernel_fwd   pallas forward compositing alone
  kernel_fb    pallas fwd+bwd via custom VJP (includes pack-transpose scatter)
  full_fwd     whole render_tiled forward
  full_fb      whole render_tiled fwd+bwd (the bench.py number)

Prints one line per stage: name, ms/iter, and for the full pipeline Mpx/s.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops import projection as P
from splatter360_tpu.ops.tiling import assign_tiles
from splatter360_tpu.ops.pallas.composite import (
    N_PIX, _composite_core, _pack_instances,
)
from splatter360_tpu.ops.rasterizer import render_tiled

H, W, SH_DEG = 512, 1024, 4
N = 2 * H * W


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    g = random_gaussians(
        jax.random.PRNGKey(0), N, sh_degree=SH_DEG,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    means, covs, sh, op = (
        g["means"], g["covariances"], g["harmonics"], g["opacities"])
    c2w = jnp.eye(4)

    @jax.jit
    def stage_project(means, covs, sh):
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
        return pr.mean2d, pr.conic, pr.depth, pr.radius, pr.valid, cols

    @jax.jit
    def stage_tiles(means, covs):
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        a = assign_tiles(pr, (H, W), True)
        return a.gaussian_idx, a.tile_starts, a.tile_counts, a.tile_ids

    @jax.jit
    def stage_pack(means, covs, sh, op):
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
        a = assign_tiles(pr, (H, W), True, with_slots=True)
        inst = _pack_instances(a, pr.mean2d, pr.conic, cols, op,
                               pr.depth, pr.radius)
        return inst, a.tile_starts, a.tile_counts, a.tile_ids

    inst, starts, counts, tile_ids = stage_pack(means, covs, sh, op)
    inst = jax.block_until_ready(inst)
    from splatter360_tpu.ops.tiling import num_tiles
    nty, ntx = num_tiles((H, W))

    @jax.jit
    def stage_kernel_fwd(inst, starts, counts, tile_ids):
        return _composite_core(inst, starts, counts, tile_ids,
                               nty, ntx, float(W), True)

    @jax.jit
    def stage_kernel_fb(inst, starts, counts, tile_ids):
        def f(inst):
            acc = _composite_core(inst, starts, counts, tile_ids,
                                  nty, ntx, float(W), True)
            return jnp.sum(acc.reshape(-1, 8, N_PIX)[:, 0:5, :])
        return jax.grad(f)(inst)

    @jax.jit
    def stage_pack_fb(means, covs, sh, op):
        """Gradient through pack's row gather alone (the scatter-add transpose)."""
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
        a = assign_tiles(pr, (H, W), True, with_slots=True)

        def f(mean2d, conic, cols, op, depth, radius):
            inst = _pack_instances(a, mean2d, conic, cols, op, depth, radius)
            return jnp.sum(inst * inst)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            pr.mean2d, pr.conic, cols, op, pr.depth, pr.radius)

    @jax.jit
    def stage_proj_fb(means, covs, sh, op):
        """Projection + SH fwd+bwd alone (no binning/compositing)."""
        def f(means, covs, sh, op):
            pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
            cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
            return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(cols)
                    + jnp.sum(pr.depth) + jnp.sum(op))
        return jax.grad(f, argnums=(0, 1, 2, 3))(means, covs, sh, op)

    @jax.jit
    def stage_full_fwd(means, covs, sh, op):
        out = render_tiled(means, covs, sh, op, c2w, (H, W),
                           camera_kind="erp", backend="pallas")
        return out.color

    @jax.jit
    def stage_full_fb(means, covs, sh, op):
        def f(means, covs, sh, op):
            out = render_tiled(means, covs, sh, op, c2w, (H, W),
                               camera_kind="erp", backend="pallas")
            return jnp.mean(out.color) + jnp.mean(out.alpha)
        return jax.grad(f, argnums=(0, 1, 2, 3))(means, covs, sh, op)

    # Given-tiles stages: the full fused render with the assignment PRECOMPUTED
    # and passed as jit args — isolates the in-situ cost of the binning sort
    # (full_* minus given_* = what assign_tiles really costs in the pipeline,
    # where XLA fusion makes stage subtraction unreliable).
    from splatter360_tpu.ops.pallas.composite import composite_tiles_pallas
    from splatter360_tpu.ops.tiling import TileAssignment

    @jax.jit
    def stage_given_fwd(means, covs, sh, op, gidx, starts, counts, tids):
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
        a2 = TileAssignment(gidx, tids, starts, counts,
                            jnp.int32(0), ntx, nty, None, ())
        rgb, alpha, dacc = composite_tiles_pallas(
            a2, pr.mean2d, pr.conic, cols, op, pr.depth, pr.radius,
            (H, W), jnp.zeros((3,), jnp.float32), True)
        return rgb

    @jax.jit
    def stage_given_fb(means, covs, sh, op, gidx, starts, counts, tids):
        def f(means, covs, sh, op):
            pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
            cols = P.sh_colors(sh, means, c2w[:3, 3], SH_DEG)
            a2 = TileAssignment(gidx, tids, starts, counts,
                                jnp.int32(0), ntx, nty, None, ())
            rgb, alpha, dacc = composite_tiles_pallas(
                a2, pr.mean2d, pr.conic, cols, op, pr.depth, pr.radius,
                (H, W), jnp.zeros((3,), jnp.float32), True)
            return jnp.mean(rgb) + jnp.mean(alpha)
        return jax.grad(f, argnums=(0, 1, 2, 3))(means, covs, sh, op)

    gidx_a, starts_a, counts_a, tids_a = jax.block_until_ready(
        stage_tiles(means, covs))

    k = inst.shape[0] * inst.shape[2]
    print(f"instances K={k} blocks={inst.shape[0]}", file=sys.stderr)

    quick = os.environ.get("SPLAT360_BREAKDOWN_QUICK") == "1"
    stages = {
        "project": lambda: timeit(stage_project, means, covs, sh),
        "tiles": lambda: timeit(stage_tiles, means, covs),
        "pack": lambda: timeit(stage_pack, means, covs, sh, op),
        "kernel_fwd": lambda: timeit(
            stage_kernel_fwd, inst, starts, counts, tile_ids),
        "kernel_fb": lambda: timeit(
            stage_kernel_fb, inst, starts, counts, tile_ids),
        "pack_fb": lambda: timeit(stage_pack_fb, means, covs, sh, op),
        "proj_fb": lambda: timeit(stage_proj_fb, means, covs, sh, op),
        "full_fwd": lambda: timeit(stage_full_fwd, means, covs, sh, op),
        "full_fb": lambda: timeit(stage_full_fb, means, covs, sh, op),
        "given_fwd": lambda: timeit(
            stage_given_fwd, means, covs, sh, op,
            gidx_a, starts_a, counts_a, tids_a),
        "given_fb": lambda: timeit(
            stage_given_fb, means, covs, sh, op,
            gidx_a, starts_a, counts_a, tids_a),
    }
    if quick:
        sel = ["kernel_fwd", "kernel_fb", "full_fb"]
    else:
        sel = list(stages)
    env_sel = os.environ.get("SPLAT360_BREAKDOWN_STAGES")
    if env_sel:
        sel = env_sel.split(",")
    res = {name: stages[name]() for name in sel}

    mpx = H * W / 1e6
    for name, ms in res.items():
        extra = f"  ({mpx / (ms / 1e3):8.2f} Mpx/s)" if name.startswith("full") \
            or name.startswith("kernel") else ""
        print(f"{name:12s} {ms:8.2f} ms{extra}")


if __name__ == "__main__":
    main()
