"""Micro-benchmark: where do project_erp's 56 ms go, and does a scalarized
covariance path fix it? Runs on the TPU."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops import projection as P

N = 2 * 512 * 1024
H, W = 512, 1024


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    g = random_gaussians(jax.random.PRNGKey(0), N, sh_degree=4)
    means, covs, sh = g["means"], g["covariances"], g["harmonics"]
    c2w = jnp.eye(4)

    @jax.jit
    def full(means, covs):
        pr = P.project_erp(means, covs, c2w, (H, W), 0.1)
        return pr.mean2d, pr.conic, pr.depth, pr.radius, pr.valid

    @jax.jit
    def means_only(means):
        # angular part only: no covariance math
        import math
        w2c = jnp.eye(4)
        p = means
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        rho = jnp.sqrt(jnp.maximum(x * x + z * z, 1e-12))
        theta = jnp.arctan2(x, z)
        phi = jnp.arctan2(y, rho)
        u = (-theta / (2 * math.pi) + 0.5) * W - 0.5
        v = (-phi / math.pi + 0.5) * H - 0.5
        return u, v

    @jax.jit
    def cov_einsum(covs, means):
        x, y, z = means[:, 0], means[:, 1], means[:, 2]
        zero = jnp.zeros_like(x)
        j = jnp.stack([
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-x * y, x * x + z * z, -z * y], axis=-1),
        ], axis=-2)
        rot = jnp.eye(3)
        t = jnp.einsum("nij,jk->nik", j, rot)
        return jnp.einsum("nij,njk,nlk->nil", t, covs, t)

    @jax.jit
    def cov_scalar(covs, means):
        x, y, z = means[:, 0], means[:, 1], means[:, 2]
        # t rows as 6 [N] scalars (rot = I here; real version folds rot in)
        t00, t01, t02 = z, jnp.zeros_like(x), -x
        t10, t11, t12 = -x * y, x * x + z * z, -z * y
        c = covs.reshape(-1, 9)
        s00, s01, s02 = c[:, 0], c[:, 1], c[:, 2]
        s11, s12, s22 = c[:, 4], c[:, 5], c[:, 8]

        def quad(a0, a1, a2, b0, b1, b2):
            return (
                a0 * (s00 * b0 + s01 * b1 + s02 * b2)
                + a1 * (s01 * b0 + s11 * b1 + s12 * b2)
                + a2 * (s02 * b0 + s12 * b1 + s22 * b2)
            )

        q00 = quad(t00, t01, t02, t00, t01, t02)
        q01 = quad(t00, t01, t02, t10, t11, t12)
        q11 = quad(t10, t11, t12, t10, t11, t12)
        return q00, q01, q11

    @jax.jit
    def sh_only(sh, means):
        return P.sh_colors(sh, means, jnp.zeros(3), 4)

    res = {
        "full_project": timeit(full, means, covs),
        "means_only": timeit(means_only, means),
        "cov_einsum": timeit(cov_einsum, covs, means),
        "cov_scalar": timeit(cov_scalar, covs, means),
        "sh_colors": timeit(sh_only, sh, means),
    }
    for k, v in res.items():
        print(f"{k:14s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
