"""Synthetic Gaussian scenes for tests and benchmarks.

Mirrors the role of the reference's manual rasterizer smoke test
(/root/reference/src/scripts/test_splatter.py:21-101 — a hand-built SH-colored Gaussian
on a spinning camera) as a reproducible generator: BASELINE config 1 is "1k random
Gaussians -> 256x512 equirect render, fwd+bwd allclose (CPU)".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.transforms import build_covariance


def random_gaussians(
    key,
    n: int,
    sh_degree: int = 4,
    radius_range=(0.5, 6.0),
    scale_range=(0.01, 0.12),
    inside_out: bool = True,
):
    """Random world-space Gaussians surrounding (or in front of) the origin.

    Returns dict(means [N,3], covariances [N,3,3], harmonics [N,3,d_sh],
    opacities [N], scales [N,3], rotations [N,4]).
    """
    ks = jax.random.split(key, 6)
    d_sh = (sh_degree + 1) ** 2
    if inside_out:
        dirs = jax.random.normal(ks[0], (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        r = jax.random.uniform(
            ks[1], (n, 1), minval=radius_range[0], maxval=radius_range[1]
        )
        means = dirs * r
    else:
        means = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
        means = means.at[:, 2].add(3.0)
    scales = jax.random.uniform(
        ks[2], (n, 3), minval=scale_range[0], maxval=scale_range[1]
    )
    quats = jax.random.normal(ks[3], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    covs = build_covariance(scales, quats)
    sh = 0.3 * jax.random.normal(ks[4], (n, 3, d_sh))
    sh = sh.at[..., 0].add(0.5)  # bias DC so colors are mostly in-gamut
    opac = jax.random.uniform(ks[5], (n,), minval=0.3, maxval=0.95)
    return {
        "means": means,
        "covariances": covs,
        "harmonics": sh,
        "opacities": opac,
        "scales": scales,
        "rotations": quats,
    }


def random_scene(key, n: int = 1000, sh_degree: int = 4):
    """Gaussians + identity ERP camera at origin (the BASELINE config-1 setup)."""
    g = random_gaussians(key, n, sh_degree)
    c2w = jnp.eye(4)
    return g, c2w
