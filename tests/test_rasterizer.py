"""Renderer correctness: dense oracle sanity, tiled-vs-dense allclose, gradient checks.

Covers BASELINE config 1 (1k Gaussians -> 256x512 equirect, fwd+bwd, CPU) and the test
pyramid priority (a) of SURVEY.md §4: allclose tests of the production rasterizer
against the pure-JAX dense oracle, plus finite-difference gradient validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.geometry import cube_face_extrinsics, cube_face_intrinsics, erp_to_cube
from splatter360_tpu.ops.rasterizer_ref import render_dense
from splatter360_tpu.ops.rasterizer import render_tiled

H, W = 64, 128  # small ERP for CPU speed; wrap/pole behavior still exercised


@pytest.fixture(scope="module")
def scene():
    g = random_gaussians(jax.random.PRNGKey(0), 300, sh_degree=2)
    return g


import functools


@functools.partial(jax.jit, static_argnames=("kind", "render_depth", "shape"))
def _render_dense_jit(g, c2w, kind="erp", render_depth=False, shape=(H, W),
                      intrinsics=None, background=None):
    out = render_dense(
        g["means"], g["covariances"], g["harmonics"], g["opacities"],
        c2w, shape, camera_kind=kind, render_depth=render_depth,
        intrinsics=intrinsics, background=background,
    )
    return out.color, out.depth, out.alpha


def _render_dense(g, c2w, kind="erp", render_depth=False, shape=(H, W), **kw):
    color, depth, alpha = _render_dense_jit(
        g, c2w, kind=kind, render_depth=render_depth, shape=shape, **kw
    )
    return type("O", (), {"color": color, "depth": depth, "alpha": alpha})()


def test_dense_nonempty_and_range(scene):
    out = _render_dense(scene, jnp.eye(4), render_depth=True)
    img = np.asarray(out.color)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something rendered
    alpha = np.asarray(out.alpha)
    assert (alpha >= -1e-6).all() and (alpha <= 1 + 1e-6).all()
    assert alpha.mean() > 0.1


def test_single_gaussian_centered():
    """One isotropic Gaussian straight ahead renders a blob at image center."""
    g = {
        "means": jnp.array([[0.0, 0.0, 2.0]]),
        "covariances": jnp.eye(3)[None] * 0.01,
        "harmonics": jnp.zeros((1, 3, 1)).at[:, 0, 0].set(1.0),
        "opacities": jnp.array([0.9]),
    }
    out = _render_dense(g, jnp.eye(4))
    img = np.asarray(out.color)
    iy, ix = np.unravel_index(img[..., 0].argmax(), img[..., 0].shape)
    assert abs(iy - (H / 2 - 0.5)) <= 1.0
    assert abs(ix - (W / 2 - 0.5)) <= 1.0
    # red channel only (precomputed color path)
    assert img[..., 1].max() < 1e-6


def test_erp_azimuth_wrap():
    """A Gaussian directly behind the camera spans the u = 0 / u = W seam."""
    g = {
        "means": jnp.array([[0.0, 0.0, -2.0]]),
        "covariances": jnp.eye(3)[None] * 0.05,
        "harmonics": jnp.zeros((1, 3, 1)).at[:, 0, 0].set(1.0),
        "opacities": jnp.array([0.9]),
    }
    out = _render_dense(g, jnp.eye(4))
    img = np.asarray(out.color[..., 0])
    row = img[H // 2]
    assert row[0] > 0.1 and row[-1] > 0.1  # bright at both seam edges
    np.testing.assert_allclose(row[0], row[-1], rtol=0.15)


def test_tiled_matches_dense_erp(scene):
    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.2, -0.1, 0.3]))
    dense = _render_dense(scene, c2w, render_depth=True)

    @jax.jit
    def run(g, c2w):
        out = render_tiled(
            g["means"], g["covariances"], g["harmonics"],
            g["opacities"], c2w, (H, W), camera_kind="erp",
            backend="jax", max_per_tile=512, render_depth=True,
        )
        return out.color, out.depth, out.alpha
    color, depth, alpha = run(scene, c2w)
    tiled = type("O", (), {"color": color, "depth": depth, "alpha": alpha})()
    np.testing.assert_allclose(
        np.asarray(tiled.color), np.asarray(dense.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tiled.alpha), np.asarray(dense.alpha), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tiled.depth), np.asarray(dense.depth), atol=1e-4
    )


def test_tiled_matches_dense_pinhole(scene):
    c2w = cube_face_extrinsics(jnp.eye(4))[0]  # front cube face
    intr = cube_face_intrinsics()
    dense = _render_dense(scene, c2w, kind="pinhole", intrinsics=intr)

    @jax.jit
    def run(g, c2w, intr):
        out = render_tiled(
            g["means"], g["covariances"], g["harmonics"],
            g["opacities"], c2w, (H, W), camera_kind="pinhole",
            intrinsics=intr, backend="jax", max_per_tile=512,
        )
        return out.color
    tiled = type("O", (), {"color": run(scene, c2w, intr)})()
    np.testing.assert_allclose(
        np.asarray(tiled.color), np.asarray(dense.color), atol=2e-5
    )


def test_cube_faces_match_erp_render(scene):
    """Pinhole renders of the 6 cube faces ~= e2c of the ERP render (validates the
    face rig convention against the ERP camera model)."""
    fw = 32
    erp_out = _render_dense(scene, jnp.eye(4))
    faces_from_erp = np.asarray(erp_to_cube(erp_out.color, fw))
    faces_c2w = cube_face_extrinsics(jnp.eye(4))
    intr = cube_face_intrinsics()
    for f in range(6):
        out = _render_dense(
            scene, faces_c2w[f], kind="pinhole", shape=(fw, fw), intrinsics=intr
        )
        got = np.asarray(out.color)
        ref = faces_from_erp[f]
        # resampling + different 2D gaussian linearization => loose tolerance (the
        # back face crosses the ERP azimuth seam where 64x128 resampling is
        # coarsest, and at W=128 the seam-safety radius cap truncates large splats
        # in the ERP render but not the pinhole ones); the structure must match
        assert np.abs(got - ref).mean() < 0.08, f"face {f}"
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.85, f"face {f}: corr {corr}"


def test_gradients_match_dense_vs_tiled(scene):
    """Backward parity: d(loss)/d(params) matches between oracle and tiled path."""
    c2w = jnp.eye(4)
    target = jnp.zeros((H, W, 3))

    def loss_dense(means, covs, sh, op):
        out = render_dense(means, covs, sh, op, c2w, (H, W), camera_kind="erp")
        return jnp.mean((out.color - target) ** 2)

    def loss_tiled(means, covs, sh, op):
        out = render_tiled(
            means, covs, sh, op, c2w, (H, W), camera_kind="erp",
            backend="jax", max_per_tile=512,
        )
        return jnp.mean((out.color - target) ** 2)

    args = (scene["means"], scene["covariances"], scene["harmonics"], scene["opacities"])
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(*args)
    gt = jax.jit(jax.grad(loss_tiled, argnums=(0, 1, 2, 3)))(*args)
    for a, b, name in zip(gd, gt, ["means", "covs", "sh", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-4, err_msg=name)


def test_gradients_finite_difference():
    """Spot-check analytic gradients against central differences (dense oracle)."""
    g = random_gaussians(jax.random.PRNGKey(2), 20, sh_degree=1)
    c2w = jnp.eye(4)
    target = 0.5 * jnp.ones((H, W, 3))

    def loss(op):
        out = render_dense(
            g["means"], g["covariances"], g["harmonics"], op, c2w, (H, W),
            camera_kind="erp",
        )
        return jnp.mean((out.color - target) ** 2)

    op = g["opacities"]
    loss = jax.jit(loss)
    grad = np.asarray(jax.jit(jax.grad(loss))(op))
    eps = 1e-3
    for i in [0, 7, 13]:
        lp = loss(op.at[i].add(eps))
        lm = loss(op.at[i].add(-eps))
        fd = (lp - lm) / (2 * eps)
        # f32 loss precision bounds FD accuracy: |loss| ~ 0.25 and eps = 1e-3 put
        # the FD difference near machine epsilon, so allow a generous atol.
        np.testing.assert_allclose(grad[i], fd, rtol=0.1, atol=1e-5)


def test_background_composited():
    g = {
        "means": jnp.array([[0.0, 0.0, 2.0]]),
        "covariances": jnp.eye(3)[None] * 0.0001,
        "harmonics": jnp.zeros((1, 3, 1)),
        "opacities": jnp.array([0.0]),
    }
    bg = jnp.array([0.1, 0.6, 0.9])
    out = _render_dense(g, jnp.eye(4), background=bg)
    np.testing.assert_allclose(
        np.asarray(out.color[0, 0]), np.asarray(bg), atol=1e-6
    )


def test_depth_rendering_modes(scene):
    """depth|log|disparity|relative_disparity depth channels (reference
    decoder.py:11-17, cuda_splatting.py:226-269 semantics: the transformed
    camera depth is composited as the rendered value).

    Checks (a) an opaque gaussian at known distance yields the analytically
    transformed value, (b) tiled matches dense in every mode.
    """
    from splatter360_tpu.ops.rasterizer import DEPTH_MODES, transform_depth

    near, far = 0.1, 10.0
    r = 2.0
    g = {
        "means": jnp.array([[0.0, 0.0, r]]),
        "covariances": jnp.eye(3)[None] * 0.01,
        "harmonics": jnp.zeros((1, 3, 1)).at[:, 0, 0].set(1.0),
        "opacities": jnp.array([0.999]),
    }
    expected = {
        "depth": r,
        "log": np.log(r),
        "disparity": 1.0 / r,
        "relative_disparity": (1.0 / r - 1.0 / far) / (1.0 / near - 1.0 / far),
    }
    cy, cx = int(H / 2 - 0.5), int(W / 2 - 0.5)
    for mode in DEPTH_MODES:
        out = render_dense(
            g["means"], g["covariances"], g["harmonics"], g["opacities"],
            jnp.eye(4), (H, W), camera_kind="erp", near=near, far=far,
            render_depth=True, depth_mode=mode,
        )
        d = float(out.depth[cy, cx]) / max(float(out.alpha[cy, cx]), 1e-6)
        np.testing.assert_allclose(d, expected[mode], rtol=1e-3)

    c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.2, -0.1, 0.3]))
    for mode in ("log", "relative_disparity"):
        dense = render_dense(
            scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"], c2w, (H, W), camera_kind="erp",
            near=near, far=far, render_depth=True, depth_mode=mode,
        )
        tiled = render_tiled(
            scene["means"], scene["covariances"], scene["harmonics"],
            scene["opacities"], c2w, (H, W), camera_kind="erp",
            near=near, far=far, render_depth=True, depth_mode=mode,
            backend="jax", max_per_tile=512,
        )
        np.testing.assert_allclose(
            np.asarray(tiled.depth), np.asarray(dense.depth), atol=1e-4
        )


def test_dropped_surfaces_on_cap_overflow(scene):
    """Emission-cap overflow is VISIBLE: render_tiled reports dropped>0 through
    DecoderOutput and train metrics (VERDICT r1 weak #4)."""
    from splatter360_tpu.models.decoder import render_erp_views
    from splatter360_tpu.models.types import Gaussians

    g = Gaussians(
        means=scene["means"][None],
        covariances=scene["covariances"][None],
        harmonics=scene["harmonics"][None],
        opacities=scene["opacities"][None],
    )
    c2w = jnp.eye(4)[None, None]
    near = jnp.full((1, 1), 0.1)
    far = jnp.full((1, 1), 100.0)

    out = render_erp_views(g, c2w, near, far, (H, W), backend="jax")
    assert out.dropped is not None and out.dropped.shape == (1, 1)
    assert int(out.dropped.sum()) == 0  # default caps hold this scene

    # starve the instance cap -> overflow must be counted, not silent
    tiny = render_tiled(
        scene["means"], scene["covariances"], scene["harmonics"],
        scene["opacities"], jnp.eye(4), (H, W), camera_kind="erp",
        backend="jax", instance_cap=8, tier_caps=(4, 4, 4),
    )
    assert int(tiny.dropped) > 0


def test_sequential_faces_match_vmap(scene):
    """lax.map face rendering (the HBM-fitting train path) is numerically
    identical to the vmapped path, for values and gradients."""
    from splatter360_tpu.models.decoder import render_cube_views
    from splatter360_tpu.models.types import Gaussians

    g = Gaussians(
        means=scene["means"][None],
        covariances=scene["covariances"][None],
        harmonics=scene["harmonics"][None],
        opacities=scene["opacities"][None],
    )
    extr = jnp.eye(4)[None, None]
    near = jnp.full((1, 1), 0.1)
    far = jnp.full((1, 1), 100.0)

    def render(op, sequential):
        out = render_cube_views(
            g._replace(opacities=op), extr, near, far, (16, 16),
            backend="jax", sequential=sequential,
        )
        return out.color

    c_v = render(g.opacities, False)
    c_s = render(g.opacities, True)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_v), atol=1e-6)

    def loss(op, sequential):
        return jnp.sum(render(op, sequential) ** 2)

    g_v = jax.grad(loss)(g.opacities, False)
    g_s = jax.grad(loss)(g.opacities, True)
    # scan vs vmap reassociates the f32 sums -> last-ulp differences only
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_v), rtol=1e-5, atol=1e-4
    )

    # the unrolled face loop (sequential="unroll", the flagship decode
    # candidate — VERDICT r3 weak #2) must also match, fwd + grad, with
    # remat on and off
    for remat in (True, False):
        c_u = render_cube_views(
            g, extr, near, far, (16, 16), backend="jax",
            sequential="unroll", remat_faces=remat,
        ).color
        np.testing.assert_allclose(np.asarray(c_u), np.asarray(c_v), atol=1e-6)

    def loss_u(op):
        out = render_cube_views(
            g._replace(opacities=op), extr, near, far, (16, 16),
            backend="jax", sequential="unroll",
        )
        return jnp.sum(out.color ** 2)

    g_u = jax.grad(loss_u)(g.opacities)
    np.testing.assert_allclose(
        np.asarray(g_u), np.asarray(g_v), rtol=1e-5, atol=1e-4
    )


def test_opacity_cull_exact_low_opacity():
    """Opacity-aware radius tightening (ops/projection.py::_finalize) must be
    output- AND gradient-exact: the tightened box only excludes pixels the
    alpha >= 1/255 gate already zeroes. Stress with low opacities (heavy
    tightening, some below 1/255 -> culled entirely). The CUDA reference
    always bins the full 3-sigma box (SURVEY.md §2.9); this is a TPU-build
    emission-count optimization that must never change a pixel."""
    g = random_gaussians(jax.random.PRNGKey(7), 300, sh_degree=2)
    op = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(8), (250,), minval=2e-3,
                           maxval=0.4),
        jnp.full((50,), 1.0 / 300.0),  # below the 1/255 gate -> culled
    ])
    c2w = jnp.eye(4)

    def run(opacity_cull, means, covs, sh, o):
        return render_tiled(
            means, covs, sh, o, c2w, (H, W), camera_kind="erp",
            backend="jax", max_per_tile=256, render_depth=True,
            opacity_cull=opacity_cull,
        )

    out_cull = run(True, g["means"], g["covariances"], g["harmonics"], op)
    out_full = run(False, g["means"], g["covariances"], g["harmonics"], op)
    np.testing.assert_allclose(
        np.asarray(out_cull.color), np.asarray(out_full.color), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_cull.alpha), np.asarray(out_full.alpha), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_cull.depth), np.asarray(out_full.depth), atol=1e-5)

    def loss(opacity_cull, means, covs, sh, o):
        out = run(opacity_cull, means, covs, sh, o)
        return jnp.mean(out.color ** 2) + 0.1 * jnp.mean(out.alpha)

    args = (g["means"], g["covariances"], g["harmonics"], op)
    g_cull = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2, 3))(*args)
    g_full = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_full, g_cull, ["means", "covs", "sh", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-6,
                                   err_msg=name)


def test_elliptical_prune_cuts_instances_exactly():
    """Elliptical emission cull (Projected.prune_d2, r4): diagonal stretched
    splats have loose AABBs — the lam_min disc bound must skip their corner
    tiles with NO output change (every skipped pixel's gate is already
    zero), and must measurably reduce emitted instances vs AABB binning."""
    from splatter360_tpu.ops.projection import project_erp
    from splatter360_tpu.ops.tiling import assign_tiles

    # diagonal (45-degree) elongated gaussians: AABB is square, ellipse thin.
    # Geometry large enough that footprints span several 16x128 tiles.
    hh, ww = 256, 512
    rng = np.random.default_rng(11)
    n = 500
    means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    d = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
    covs = (
        0.25**2 * d[None, :, None] * d[None, None, :]
        + 0.01**2 * np.eye(3)[None]
    ).astype(np.float32)
    sh = rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)
    op = rng.uniform(0.4, 0.9, n).astype(np.float32)
    c2w = jnp.eye(4)

    proj = project_erp(
        jnp.asarray(means), jnp.asarray(covs), c2w, (hh, ww), 0.1,
        opacities=jnp.asarray(op),
    )
    a_pruned = assign_tiles(proj, (hh, ww), wrap_x=True)
    a_aabb = assign_tiles(
        proj._replace(gate_s=None), (hh, ww), wrap_x=True)
    k_pruned = int(np.sum(np.asarray(a_pruned.tile_counts)))
    k_aabb = int(np.sum(np.asarray(a_aabb.tile_counts)))
    assert k_pruned < 0.9 * k_aabb, (k_pruned, k_aabb)

    # output-identical: render through the same backend with both bindings
    from splatter360_tpu.ops.composite_jax import composite_tiles_jax

    bg = jnp.zeros((3,))
    from splatter360_tpu.ops.projection import sh_colors
    cols = sh_colors(jnp.asarray(sh), jnp.asarray(means), c2w[:3, 3], 1)
    outs = []
    for asg in (a_pruned, a_aabb):
        rgb, alpha, dacc = composite_tiles_jax(
            asg, proj.mean2d, proj.conic, cols, jnp.asarray(op),
            proj.depth, proj.radius, (hh, ww), bg, True, max_per_tile=512,
        )
        outs.append((np.asarray(rgb), np.asarray(alpha)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)
