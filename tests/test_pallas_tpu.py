"""REAL-Mosaic parity suite (VERDICT r2 weak #6).

The CPU test suite exercises the pallas kernels through the interpreter
only; this file runs the same parity claims on the actual chip, closing
the "interpreter agrees" vs "Mosaic agrees" gap:

  SPLAT360_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -x -q

Skipped automatically when the backend isn't a TPU (i.e. in the normal
CPU-pinned suite). Never run while another process holds the TPU tunnel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.geometry.transforms import cov_as_sym6
from splatter360_tpu.ops.rasterizer import render_tiled

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="real-Mosaic parity needs a TPU (SPLAT360_TPU_TESTS=1)",
)

H, W, N = 64, 256, 4000


@pytest.fixture(scope="module")
def scene():
    g = random_gaussians(jax.random.PRNGKey(11), N, sh_degree=2)
    g["covariances"] = cov_as_sym6(g["covariances"])
    return g


def _render(scene, backend, **kw):
    return render_tiled(
        scene["means"], scene["covariances"], scene["harmonics"],
        scene["opacities"], jnp.eye(4), (H, W), camera_kind="erp",
        backend=backend, max_per_tile=1024, render_depth=True, **kw,
    )


def test_mosaic_forward_matches_jax_oracle(scene):
    pal = jax.jit(lambda: _render(scene, "pallas"))()
    ref = jax.jit(lambda: _render(scene, "jax"))()
    np.testing.assert_allclose(
        np.asarray(pal.color), np.asarray(ref.color), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(pal.alpha), np.asarray(ref.alpha), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(pal.depth), np.asarray(ref.depth), atol=2e-4)


def test_mosaic_gradients_match_jax_oracle(scene):
    def loss(backend, means, covs, sh, op):
        out = render_tiled(
            means, covs, sh, op, jnp.eye(4), (H, W), camera_kind="erp",
            backend=backend, max_per_tile=1024,
        )
        return jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)

    args = (scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"])
    g_pal = jax.jit(jax.grad(functools.partial(loss, "pallas"),
                             argnums=(0, 1, 2, 3)))(*args)
    g_ref = jax.jit(jax.grad(functools.partial(loss, "jax"),
                             argnums=(0, 1, 2, 3)))(*args)
    for a, b, name in zip(g_pal, g_ref, ["means", "covs", "sh", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-5, err_msg=name)


def test_mosaic_pinhole_face_path(scene):
    """The cube-face (pinhole) production path on-device."""
    from splatter360_tpu.geometry.cubemap import (
        cube_face_extrinsics, cube_face_intrinsics,
    )

    c2w = cube_face_extrinsics(jnp.eye(4)[None, None])[0, 0, 2]
    intr = cube_face_intrinsics(jnp.float32)
    kw = dict(camera_kind="pinhole", intrinsics=intr, max_per_tile=1024)
    pal = jax.jit(lambda: render_tiled(
        scene["means"], scene["covariances"], scene["harmonics"],
        scene["opacities"], c2w, (64, 64), backend="pallas", **kw))()
    ref = jax.jit(lambda: render_tiled(
        scene["means"], scene["covariances"], scene["harmonics"],
        scene["opacities"], c2w, (64, 64), backend="jax", **kw))()
    np.testing.assert_allclose(
        np.asarray(pal.color), np.asarray(ref.color), atol=3e-5)
