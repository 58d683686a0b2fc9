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


def _saturating_scene():
    """A scene whose tile 0 fully saturates after ~6 of ~21 blocks.

    Dense opaque blobs tiled over every pixel of the 32x256 image: regression
    geometry for the forward early exit (which only fires when ALL pixels of a
    tile saturate). Verified to give nproc < n_blocks for the pallas kernel.
    """
    import math

    from splatter360_tpu.geometry.transforms import build_covariance

    hh, ww = 32, 256
    u_centers = np.arange(6.0, 128.0, 12.0)
    v_centers = np.arange(2.5, 32.0, 5.0)  # sigma_y ~2.6 px at this aspect
    depths = np.linspace(1.0, 6.0, 40)
    focal = ww / (2 * math.pi)
    means, scales = [], []
    for d in depths:
        for u in u_centers:
            for vv in v_centers:
                theta = (0.5 - (u + 0.5) / ww) * 2 * math.pi
                phi = (0.5 - (vv + 0.5) / hh) * math.pi
                dirv = np.array([
                    math.cos(phi) * math.sin(theta), math.sin(phi),
                    math.cos(phi) * math.cos(theta),
                ])
                means.append(dirv * d)
                s = 10.0 * d / focal
                scales.append([s, s, s])
    means = jnp.asarray(np.array(means), jnp.float32)
    n = means.shape[0]
    covs = build_covariance(
        jnp.asarray(np.array(scales), jnp.float32),
        jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
    )
    sh = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (n, 3, 9))
    sh = sh.at[..., 0].add(0.5)
    return (hh, ww), means, covs, sh, jnp.full((n,), 0.92)


def test_pallas_backward_early_exit_saturated():
    """The forward's early exit stops accumulating log-T mid-segment; the
    backward must telescope its suffix over exactly the processed blocks
    (pre-fix this produced NaN/zero gradients on saturating scenes)."""
    (hh, ww), means, covs, sh, opac = _saturating_scene()
    target = jnp.zeros((hh, ww, 3))

    def loss(backend, means, covs, sh, op):
        out = render_tiled(
            means, covs, sh, op, jnp.eye(4), (hh, ww), camera_kind="erp",
            backend=backend, max_per_tile=4096,
        )
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    args = (means, covs, sh, opac)
    g_jax = jax.grad(functools.partial(loss, "jax"), argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(functools.partial(loss, "pallas"), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_jax, g_pal, ["means", "covs", "sh", "opac"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), f"{name}: non-finite pallas grads"
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)


def test_pallas_backward_live_cap_overflow_fallback(scene, monkeypatch):
    """When live blocks overflow the compaction cap, the backward must take
    the exact all-blocks lax.cond branch and produce identical gradients.

    Forces the legacy (unfused) render core — the fused path has no live-block
    compaction cap; this guards the XLA-reduce fallback kept for A/B benches."""
    monkeypatch.setattr(pc, "_FUSED_PACK", False)
    monkeypatch.setattr(pc, "_LIVE_FRAC", 10**9)  # l_cap == 1 -> always overflow
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
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)


def test_bf16_split_mxu_emulation():
    """Guard the bf16-split contraction algebra against an emulated MXU.

    A DEFAULT-precision TPU pass rounds f32 operands to bf16 and accumulates
    in f32. CPU interpret mode runs contractions in full f32, so this contract
    is emulated here with explicit ml_dtypes rounding: the 2-pass binary split
    must match the f64 reference to ~2^-16 relative, the 3-pass two-sided
    split to ~2^-16 (lo*lo term is ~2^-32)."""
    import numpy as np
    import ml_dtypes

    rng = np.random.default_rng(0)
    n, k, m = 64, 128, 96

    def round_bf16(x):
        return x.astype(ml_dtypes.bfloat16).astype(np.float32)

    def mxu_default(a, b):
        # bf16 operand rounding, f32 accumulation
        return round_bf16(a).astype(np.float64) @ round_bf16(b).astype(
            np.float64
        )

    a = rng.normal(0, 1, (n, k)).astype(np.float32) * rng.uniform(
        0.01, 100, (n, 1)
    ).astype(np.float32)
    hi = round_bf16(a)
    lo = a - hi
    # hi is bf16-exact; lo (the residual, ~2^-9 of a) is NOT, but its own
    # rounding error is ~2^-9 * |lo| = ~2^-18 * |a| - below the target bound.
    np.testing.assert_array_equal(round_bf16(hi), hi)
    assert np.abs(lo).max() <= np.abs(a).max() * 2**-8

    ref = a.astype(np.float64)

    # binary matrix (exact in bf16): 2 passes reconstruct the product
    mbin = (rng.uniform(0, 1, (k, m)) > 0.5).astype(np.float32)
    exact = ref @ mbin.astype(np.float64)
    two_pass = mxu_default(hi, mbin) + mxu_default(lo, mbin)
    # error is relative to the magnitude of the summed TERMS (cancellation in
    # the result itself cannot be blamed on the split)
    scale_bin = np.abs(ref) @ mbin.astype(np.float64)
    rel = np.abs(two_pass - exact) / np.maximum(scale_bin, 1e-3)
    assert rel.max() < 2e-5, rel.max()

    # general matrix: 3 passes (two-sided split, lo*lo dropped)
    b = rng.normal(0, 1, (k, m)).astype(np.float32) * rng.uniform(
        0.01, 100, (1, m)
    ).astype(np.float32)
    b_hi = round_bf16(b)
    b_lo = b - b_hi
    exact = ref @ b.astype(np.float64)
    three_pass = (
        mxu_default(hi, b_hi) + mxu_default(hi, b_lo) + mxu_default(lo, b_hi)
    )
    scale = (np.abs(ref) @ np.abs(b).astype(np.float64))  # cancellation-aware
    rel = np.abs(three_pass - exact) / np.maximum(scale, 1e-3)
    assert rel.max() < 2e-5, rel.max()


def test_vmem_guard_falls_back_unfused(monkeypatch):
    """The fused kernels hold a [NSUB, 128] f32 table resident in VMEM;
    beyond the budget (3-view 512x1024 contexts: N = 3*H*W = 1.57M ->
    ~100 MB) Mosaic allocation would fail at compile time. _use_fused must
    flip at the budget, and the unfused path must produce the same render
    (it is the same math streaming blocks from HBM)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splatter360_tpu.data.synthetic import random_gaussians
    from splatter360_tpu.ops.pallas import composite as C
    from splatter360_tpu.ops.rasterizer import render_tiled

    # threshold arithmetic at the real production sizes
    n_2view = 2 * 512 * 1024
    n_3view = 3 * 512 * 1024
    assert C._fused_table_bytes(n_2view) <= 94 * 1024 * 1024
    assert C._fused_table_bytes(n_3view) > 94 * 1024 * 1024
    assert C._use_fused(n_2view) and not C._use_fused(n_3view)

    # same outputs through the forced-unfused path (tiny scene, interpret)
    g = random_gaussians(jax.random.PRNGKey(5), 600, sh_degree=1)
    args = (g["means"], g["covariances"], g["harmonics"], g["opacities"])

    def run():
        # width >= 2 tiles: the pallas path rejects single-tile-wide wrap
        # renders (per-tile seam re-centering envelope)
        return render_tiled(
            *args, jnp.eye(4), (32, 256), camera_kind="erp",
            backend="pallas", max_per_tile=256,
        ).color

    monkeypatch.setenv("SPLAT360_PALLAS_INTERPRET", "1")
    fused = np.asarray(jax.jit(run)())
    monkeypatch.setattr(C, "_FUSED_VMEM_BUDGET", 1)  # force the fallback
    assert not C._use_fused(600)
    unfused = np.asarray(jax.jit(run)())
    np.testing.assert_allclose(unfused, fused, atol=2e-5)
