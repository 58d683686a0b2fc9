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


def test_band_sharded_pad_relaxation(scene):
    """Heights that don't split into tile-row-aligned bands are padded and
    cropped: h=48 on an 8-device mesh (48 % (16*8) != 0) must still match the
    single-device render."""
    mesh = create_mesh(N_DEV)
    m, c, s, o = (scene["means"], scene["covariances"], scene["harmonics"],
                  scene["opacities"])
    c2w = jnp.eye(4)
    h_odd = 48
    ref = render_tiled(m, c, s, o, c2w, (h_odd, W), camera_kind="erp",
                       backend="jax", max_per_tile=512)

    @jax.jit
    def run(m, c, s, o, c2w):
        out = render_erp_sharded(
            m, c, s, o, c2w, (h_odd, W), mesh, backend="jax",
            max_per_tile=512,
        )
        return out.color, out.alpha

    color, alpha = run(m, c, s, o, c2w)
    assert color.shape == (h_odd, W, 3)
    np.testing.assert_allclose(
        np.asarray(color), np.asarray(ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref.alpha), atol=2e-5
    )


def test_band_sharded_unequal_area_weighted_bands(scene):
    """Area-weighted partition with genuinely UNEQUAL bands (r4): h=160 on a
    4-device mesh gives 10 tile rows split as polar-heavy/equator-light
    (e.g. [3,2,2,3]), so the fixed-size band buffers carry unused tail rows
    and the static row-gather assembly is exercised. Must still match the
    single-device render exactly."""
    from splatter360_tpu.parallel.render_sharding import _band_partition

    h_tall = 160
    starts, rows = _band_partition(h_tall // 16, N_DEV, h_tall)
    assert len(set(rows)) > 1, (starts, rows)  # really unequal
    mesh = create_mesh(N_DEV)
    m, c, s, o = (scene["means"], scene["covariances"], scene["harmonics"],
                  scene["opacities"])
    c2w = jnp.eye(4)
    ref = render_tiled(m, c, s, o, c2w, (h_tall, W), camera_kind="erp",
                       backend="jax", max_per_tile=512)

    @jax.jit
    def run(m, c, s, o, c2w):
        out = render_erp_sharded(
            m, c, s, o, c2w, (h_tall, W), mesh, backend="jax",
            max_per_tile=512,
        )
        return out.color, out.alpha

    color, alpha = run(m, c, s, o, c2w)
    assert color.shape == (h_tall, W, 3)
    np.testing.assert_allclose(
        np.asarray(color), np.asarray(ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref.alpha), atol=2e-5
    )


def test_render_erp_views_sharded_wrapper(scene):
    """The decoder-interface wrapper (train.shard_render path) matches
    render_erp_views across batch/view axes."""
    from splatter360_tpu.models.decoder import render_erp_views
    from splatter360_tpu.models.types import Gaussians
    from splatter360_tpu.parallel.render_sharding import (
        render_erp_views_sharded,
    )

    mesh = create_mesh(N_DEV)
    m, c, s, o = (scene["means"], scene["covariances"], scene["harmonics"],
                  scene["opacities"])
    g = Gaussians(means=m[None], covariances=c[None], harmonics=s[None],
                  opacities=o[None])
    extr = jnp.stack([
        jnp.eye(4),
        jnp.eye(4).at[:3, 3].set(jnp.array([0.2, 0.0, -0.1])),
    ])[None]  # [1, 2, 4, 4]
    near = jnp.full((1, 2), 0.1)
    far = jnp.full((1, 2), 100.0)

    ref = render_erp_views(g, extr, near, far, (H, W), backend="jax",
                           render_depth=True)
    out = render_erp_views_sharded(g, extr, near, far, (H, W), mesh,
                                   backend="jax", render_depth=True,
                                   max_per_tile=512)
    assert out.color.shape == ref.color.shape
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(ref.depth), atol=1e-4
    )


def test_face_sharded_cube_views_match_and_grads(scene):
    """train.shard_faces path: render_cube_views_face_sharded on a
    (data=2, face=2) mesh must match the unsharded sequential decoder in
    outputs AND gaussian gradients (shard_map transpose psums the replicated
    gaussian cotangents over the face axis)."""
    from splatter360_tpu.models.decoder import render_cube_views
    from splatter360_tpu.models.types import Gaussians
    from splatter360_tpu.parallel.mesh import create_mesh_2d, face_mesh_split
    from splatter360_tpu.parallel.render_sharding import (
        render_cube_views_face_sharded,
    )

    b, v, face = 2, 2, 32
    n_data, n_face = face_mesh_split(b, 6 * v, 4)
    assert (n_data, n_face) == (2, 2)
    mesh = create_mesh_2d(n_data, n_face)

    m, c, s, o = (scene["means"], scene["covariances"], scene["harmonics"],
                  scene["opacities"])
    reps = lambda x: jnp.stack([x, x * 0.95 + 0.01])  # two distinct examples
    g = Gaussians(means=reps(m), covariances=reps(c), harmonics=reps(s),
                  opacities=jnp.stack([o, jnp.clip(o * 0.9, 0, 1)]))
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    extr = extr.at[:, 1, :3, 3].set(jnp.array([0.2, 0.0, -0.1]))
    near = jnp.full((b, v), 0.1)
    far = jnp.full((b, v), 100.0)

    kw = dict(backend="jax", max_per_tile=512, render_depth=True)
    ref = render_cube_views(g, extr, near, far, (face, face),
                            sequential=True, remat_faces=True, **kw)
    out = jax.jit(lambda gg: render_cube_views_face_sharded(
        gg, extr, near, far, (face, face), mesh, **kw))(g)
    assert out.color.shape == ref.color.shape == (b, v, 6, face, face, 3)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-4)

    def loss_ref(gg):
        r = render_cube_views(gg, extr, near, far, (face, face),
                              sequential=True, remat_faces=True, **kw)
        return jnp.mean(r.color ** 2) + 0.1 * jnp.mean(r.alpha)

    def loss_sh(gg):
        r = render_cube_views_face_sharded(gg, extr, near, far,
                                           (face, face), mesh, **kw)
        return jnp.mean(r.color ** 2) + 0.1 * jnp.mean(r.alpha)

    g_ref = jax.grad(loss_ref)(g)
    g_sh = jax.jit(jax.grad(loss_sh))(g)
    for a, b_, name in zip(g_sh, g_ref, Gaussians._fields):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = np.abs(b_).max() + 1e-12
        np.testing.assert_allclose(a / scale, b_ / scale, atol=1e-5,
                                   err_msg=f"grad mismatch: {name}")
