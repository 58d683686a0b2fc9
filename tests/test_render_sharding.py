"""Band-sharded renderer (parallel/render_sharding.py) vs single-device render.

Runs on the 8-device virtual CPU mesh (conftest). The sharded path splits
Gaussians over the mesh, all_gathers packed 2D params, and composites one
tile-row band per device — the output must match the unsharded tiled renderer
exactly (same binning and compositing math per tile), including gradients
through the shard_map (reduce-scatter transpose of the all_gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops.rasterizer import render_tiled
from splatter360_tpu.parallel.mesh import create_mesh
from splatter360_tpu.parallel.render_sharding import render_erp_sharded

H, W, N = 64, 256, 1500
N_DEV = 4  # 64 = 4 bands x TILE_H(16)


@pytest.fixture(scope="module")
def scene():
    g = random_gaussians(jax.random.PRNGKey(3), N, sh_degree=1)
    return g


def test_band_sharded_render_matches_single_device(scene):
    mesh = create_mesh(N_DEV)
    c2w = jnp.eye(4)
    args = (scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"])

    ref = render_tiled(*args, c2w, (H, W), camera_kind="erp", backend="jax",
                       max_per_tile=512)
    def fn(m, c, s, o):
        out = render_erp_sharded(
            m, c, s, o, c2w, (H, W), mesh, backend="jax", max_per_tile=512
        )
        return out.color, out.alpha

    color, alpha = jax.jit(fn)(*args)

    np.testing.assert_allclose(
        np.asarray(color), np.asarray(ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref.alpha), atol=2e-5
    )


def test_band_sharded_gradients_match(scene):
    mesh = create_mesh(N_DEV)
    c2w = jnp.eye(4)
    args = (scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"])

    def loss_sharded(m, c, s, o):
        out = render_erp_sharded(m, c, s, o, c2w, (H, W), mesh,
                                 backend="jax", max_per_tile=512)
        return jnp.mean(out.color) + jnp.mean(out.alpha)

    def loss_ref(m, c, s, o):
        out = render_tiled(m, c, s, o, c2w, (H, W), camera_kind="erp",
                           backend="jax", max_per_tile=512)
        return jnp.mean(out.color) + jnp.mean(out.alpha)

    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 3)))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 3)))(*args)
    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, rtol=2e-4
        )
