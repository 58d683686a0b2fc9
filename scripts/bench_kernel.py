"""Kernel perf experiments: forward/backward timing at production scale.

Usage: python scripts/bench_kernel.py [fwd|bwd|both]
Honors SPLAT360_KERNEL_PRECISION / SPLAT360_KERNEL_EARLY_EXIT.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops import rasterizer


def timed(f, *args, reps=5):
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    H, W = 512, 1024
    n = 2 * H * W
    g = random_gaussians(
        jax.random.PRNGKey(0), n, sh_degree=4, radius_range=(0.5, 8.0),
        scale_range=(0.004, 0.03),
    )
    c2w = jnp.eye(4)
    args = (g["means"], g["covariances"], g["harmonics"], g["opacities"])

    if mode in ("fwd", "both"):
        f = jax.jit(
            lambda m, c, s, o: rasterizer.render_tiled(
                m, c, s, o, c2w, (H, W), camera_kind="erp", backend="pallas"
            ).color.sum()
        )
        dt = timed(f, *args)
        print(f"forward: {dt*1e3:.0f} ms  ({H*W/dt/1e6:.1f} Mpx/s)")

    if mode in ("bwd", "both"):
        gradf = jax.jit(jax.grad(
            lambda m, c, s, o: rasterizer.render_tiled(
                m, c, s, o, c2w, (H, W), camera_kind="erp", backend="pallas"
            ).color.mean(),
            argnums=(0, 1, 2, 3),
        ))
        dt = timed(lambda *a: gradf(*a)[0], *args, reps=3)
        print(f"fwd+bwd: {dt*1e3:.0f} ms  ({H*W/dt/1e6:.1f} Mpx/s)")


if __name__ == "__main__":
    main()
