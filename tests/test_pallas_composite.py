"""Pallas compositing kernel vs the jnp fallback (interpret mode on CPU).

The production Mosaic path is exercised on real TPU by bench.py; here the same kernel
runs through the Pallas interpreter so CI on CPU validates numerics + the custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import splatter360_tpu.ops.pallas.composite as pc
from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops.rasterizer import render_tiled

H, W = 64, 256  # 4x2 tiles of 16x128


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pc.pl.pallas_call
    monkeypatch.setattr(
        pc.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


@pytest.fixture(scope="module")
def scene():
    return random_gaussians(jax.random.PRNGKey(1), 200, sh_degree=2)


def _run(g, backend):
    out = render_tiled(
        g["means"], g["covariances"], g["harmonics"], g["opacities"],
        jnp.eye(4), (H, W), camera_kind="erp", backend=backend,
        max_per_tile=256, render_depth=True,
    )
    return out.color, out.alpha, out.depth


def test_pallas_forward_matches_jax(scene):
    c_jax, a_jax, d_jax = _run(scene, "jax")
    c_pal, a_pal, d_pal = _run(scene, "pallas")
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_jax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_jax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_jax), atol=5e-4)


def test_pallas_backward_matches_jax(scene):
    target = jnp.zeros((H, W, 3))

    def loss(backend, means, covs, sh, op):
        out = render_tiled(
            means, covs, sh, op, jnp.eye(4), (H, W), camera_kind="erp",
            backend=backend, max_per_tile=256,
        )
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    args = (scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"])
    g_jax = jax.grad(functools.partial(loss, "jax"), argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_jax, g_pal, ["means", "covs", "sh", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-3, err_msg=name
        )
