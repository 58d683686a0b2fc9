"""Benchmark: renderer fwd+bwd throughput at 512x1024 equirect (the north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures Mpixels/s/chip for a full forward+backward of the tiled Gaussian rasterizer
at the reference workload scale (BASELINE.md: N = v*H*W Gaussians from 2 context views
at 512x1024, rendered to 512x1024 equirect). `vs_baseline` is measured against the
reference CUDA rasterizer class: the 3DGS tile rasterizer renders+backprops ~0.5M
pixels in ~25 ms fwd+bwd on a V100-class GPU at ~1M Gaussians (= ~21 Mpx/s); the
repo publishes no numbers (BASELINE.json.published == {}), so that anchor is our
documented assumption.

Runs on whatever jax.devices() provides (the axon TPU under the driver; CPU locally
with SPLAT360_BENCH_SMALL=1 for a smoke run).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPX_S = 21.0


def main():
    from splatter360_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    import jax
    import jax.numpy as jnp

    small = os.environ.get("SPLAT360_BENCH_SMALL") == "1"
    platform = jax.devices()[0].platform

    from splatter360_tpu.data.synthetic import random_gaussians
    from splatter360_tpu.ops.rasterizer import render_tiled

    if small:
        h, w, n, sh_degree = 128, 256, 20_000, 2
        backend = "jax"
        max_per_tile = 512
    else:
        h, w, sh_degree = 512, 1024, 4
        n = 2 * h * w  # ~1.05M: one Gaussian per context pixel, 2 views
        backend = "pallas"
        max_per_tile = 0  # unused by pallas backend

    from splatter360_tpu.geometry.transforms import cov_as_sym6

    g = random_gaussians(
        jax.random.PRNGKey(0), n, sh_degree=sh_degree,
        radius_range=(0.5, 8.0), scale_range=(0.004, 0.03),
    )
    # sym6 covariances: the PRODUCTION gradient layout (the model adapter
    # emits sym6 precisely because a [N, 3, 3] leaf pays a (3,3)->(8,128)
    # tiling tax on HBM — BASELINE.md padding note). Benchmarking the
    # [N, 3, 3] cotangent would measure a path the train step never runs.
    g["covariances"] = cov_as_sym6(g["covariances"])
    c2w = jnp.eye(4)

    def loss_fn(means, covs, sh, op):
        out = render_tiled(
            means, covs, sh, op, c2w, (h, w), camera_kind="erp",
            backend=backend, render_depth=False,
            max_per_tile=(max_per_tile or 512),
        )
        return jnp.mean(out.color) + jnp.mean(out.alpha)

    fwd_bwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
    args = (g["means"], g["covariances"], g["harmonics"], g["opacities"])

    def run_once():
        grads = fwd_bwd(*args)
        jax.block_until_ready(grads)
        return grads

    try:
        run_once()  # compile + warmup
    except Exception as e:  # pallas path failed -> fall back so bench still reports
        if backend == "pallas":
            backend = "jax"
            max_per_tile = 4096
            fwd_bwd = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
            run_once()
            print(f"warning: pallas backend failed ({e}); jax fallback",
                  file=sys.stderr)
        else:
            raise

    # Enqueue all steps, then block ONCE: steps are dependency-free, so this
    # measures device throughput instead of adding a host<->device round trip
    # per step (the axon TPU tunnel costs ~4 ms/sync, which at ~100 ms/step
    # would deflate the number ~25%).
    steps = 3 if small else 10
    t0 = time.perf_counter()
    grads = None
    for _ in range(steps):
        grads = fwd_bwd(*args)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / steps

    mpx_s = (h * w) / dt / 1e6
    print(json.dumps({
        "metric": f"render_fwd_bwd_mpx_per_s_{platform}",
        "value": round(mpx_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpx_s / BASELINE_MPX_S, 3),
    }))


if __name__ == "__main__":
    main()
