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


def _assert_close_gated(a, b, name, p99_tol, flip_tol, flip_frac):
    """Real-chip cross-backend comparison: percentile-based.

    On device the pallas kernel's log-prefix rides the 2-pass bf16-split
    MXU contraction (~2^-16 relative, BASELINE.md) while the jax backend's
    prefix is a plain f32 cumsum — the bulk of pixels agree to ~5e-5, but
    ulp differences at the T_EPS / alpha-min gates flip whole trailing
    splats on ~0.1% of pixels (measured 0.22% of color elements on this scene, max 0.16).
    Both facts are design properties, not bugs; assert them quantitatively
    instead of a uniform atol."""
    d = np.abs(np.asarray(a) - np.asarray(b)).reshape(-1)
    assert np.percentile(d, 99) < p99_tol, (
        f"{name}: p99={np.percentile(d, 99):.3e} (bulk disagreement, not "
        f"gate flips — a real kernel numerics regression)")
    frac = (d > flip_tol).mean()
    assert frac < flip_frac, (
        f"{name}: {frac:.4%} of elements differ by >{flip_tol} "
        f"(gate-flip rate blew up)")


def test_mosaic_forward_matches_jax_oracle(scene):
    def tup(backend):
        out = _render(scene, backend)
        return out.color, out.alpha, out.depth

    pal = jax.jit(lambda: tup("pallas"))()
    ref = jax.jit(lambda: tup("jax"))()
    _assert_close_gated(pal[0], ref[0], "color", 1e-4, 1e-3, 0.005)
    _assert_close_gated(pal[1], ref[1], "alpha", 1e-4, 1e-3, 0.005)
    _assert_close_gated(pal[2], ref[2], "depth", 1e-3, 1e-1, 0.005)


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
        _assert_close_gated(a / scale, b / scale, f"grad {name}",
                            2e-4, 2e-3, 0.005)


def test_mosaic_pinhole_face_path(scene):
    """The cube-face (pinhole) production path on-device."""
    from splatter360_tpu.geometry.cubemap import (
        cube_face_extrinsics, cube_face_intrinsics,
    )

    c2w = cube_face_extrinsics(jnp.eye(4)[None, None])[0, 0, 2]
    intr = cube_face_intrinsics(jnp.float32)
    kw = dict(camera_kind="pinhole", intrinsics=intr, max_per_tile=1024)

    def color(backend):
        return render_tiled(
            scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"], c2w, (64, 64), backend=backend, **kw).color

    pal = jax.jit(lambda: color("pallas"))()
    ref = jax.jit(lambda: color("jax"))()
    _assert_close_gated(pal, ref, "face color", 1e-4, 1e-3, 0.005)
