"""Encoder/decoder/train-step smoke tests at tiny shapes (CPU).

Covers SURVEY.md §4 priority (d): end-to-end inference on one (synthetic) scene — the
minimum e2e slice of §7. Shapes are tiny (32x64 ERP) so the whole graph compiles fast.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter360_tpu.models.encoder import EncoderConfig, EncoderCostVolume360
from splatter360_tpu.models.adapter import GaussianAdapterConfig
from splatter360_tpu.train.state import (
    TrainConfig,
    OptimizerConfig,
    create_train_state,
    make_train_step,
)
from splatter360_tpu.train.losses import LossConfig

H, W = 32, 64
B, V = 1, 2


def tiny_encoder_cfg(**kw):
    return EncoderConfig(
        d_feature=32,
        num_depth_candidates=16,
        downscale_factor=8,
        costvolume_unet_feat_dim=32,
        costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,),
        depth_unet_feat_dim=8,
        depth_unet_attn_res=(8,),
        depth_unet_channel_mult=(1, 1, 1, 1),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
        **kw,
    )


def tiny_batch(key=0):
    rng = np.random.default_rng(key)
    ex = {}
    for part, v in (("context", V), ("target", 2)):
        poses = np.tile(np.eye(4, dtype=np.float32), (B, v, 1, 1))
        poses[..., :3, 3] = rng.normal(0, 0.2, (B, v, 3))
        ex[part] = {
            "extrinsics_sphere": poses,
            "image_sphere": rng.uniform(0, 1, (B, v, H, W, 3)).astype(np.float32),
            "depth_sphere": rng.uniform(0.5, 5, (B, v, H, W)).astype(np.float32),
            "near": np.full((B, v), 0.1, np.float32),
            "far": np.full((B, v), 10.0, np.float32),
            "index": np.arange(v, dtype=np.int32)[None].repeat(B, 0),
        }
    return ex


@pytest.fixture(scope="module")
def state_and_step():
    cfg = tiny_encoder_cfg()
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=100),
        loss=LossConfig(lpips_weight=0.05, depth_weight=0.1),
        supervision="cubes",
        render_backend="jax",
    )
    batch = tiny_batch()
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    step = jax.jit(make_train_step(cfg, tcfg))
    return state, step, batch, cfg


def test_encoder_forward_shapes(state_and_step):
    state, _, batch, cfg = state_and_step
    from splatter360_tpu.train.state import _context_cubes

    ctx = batch["context"]
    cubes = _context_cubes(jnp.asarray(ctx["image_sphere"]), H // 2)
    gaussians, depth = state.apply_fn(
        state.params,
        jnp.asarray(ctx["image_sphere"]),
        cubes,
        jnp.asarray(ctx["extrinsics_sphere"]),
        jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]),
        0,
    )
    n = V * H * W
    assert gaussians.means.shape == (B, n, 3)
    assert gaussians.covariances.shape == (B, n, 6)  # sym6 (layout-friendly)
    assert gaussians.harmonics.shape == (B, n, 3, 4)  # sh_degree 1
    assert gaussians.opacities.shape == (B, n)
    assert depth.shape == (B, V, H, W)
    d = np.asarray(depth)
    assert (d >= 0.1 - 1e-5).all() and (d <= 10.0 + 1e-5).all()
    assert np.isfinite(np.asarray(gaussians.means)).all()
    # covariances PSD
    from splatter360_tpu.geometry.transforms import sym6_to_matrix

    cov_m = np.asarray(sym6_to_matrix(gaussians.covariances[0, :50]))
    evals = np.linalg.eigvalsh(cov_m)
    assert (evals > -1e-8).all()


def test_train_step_decreases_loss(state_and_step):
    state, step, batch, _ = state_and_step
    metrics_hist = []
    s = state
    for _ in range(5):
        s, m = step(s, batch)
        metrics_hist.append(float(m["loss"]))
    assert np.isfinite(metrics_hist).all()
    assert int(s.step) == 5
    # overfitting a single tiny batch must reduce the loss
    assert metrics_hist[-1] < metrics_hist[0]


def test_train_step_erp_supervision():
    cfg = tiny_encoder_cfg()
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=100),
        loss=LossConfig(lpips_weight=0.0, depth_weight=0.1),
        supervision="erp",
        render_backend="jax",
    )
    batch = tiny_batch(1)
    state = create_train_state(jax.random.PRNGKey(1), cfg, tcfg, batch)
    step = jax.jit(make_train_step(cfg, tcfg))
    s, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert "psnr" in m


def test_epipolar_cross_attention():
    """EpipolarCrossAttention: shape-preserving, finite, and pose-sensitive."""
    import jax
    import jax.numpy as jnp

    from splatter360_tpu.models.epipolar import EpipolarCrossAttention

    b, v, h, w, c = 1, 2, 8, 16, 16
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (b, v, h, w, c))
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    extr = extr.at[:, 1, 0, 3].set(0.5)  # translate view 1
    near = jnp.full((b, v), 0.5)
    far = jnp.full((b, v), 10.0)
    mod = EpipolarCrossAttention(d_model=c, num_samples=8)
    params = mod.init(rng, feats, extr, near, far)
    out = mod.apply(params, feats, extr, near, far)
    assert out.shape == feats.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # a different relative pose must change the gathered samples
    extr2 = extr.at[:, 1, 1, 3].set(0.7)
    out2 = mod.apply(params, feats, extr2, near, far)
    assert not bool(jnp.allclose(out, out2, atol=1e-5))


def test_spherical_sweep_warp_gt_depth():
    """SURVEY.md §4(c): warping the other view's image with the GT radius must
    reproduce the reference view (the reference's debug_warp check,
    depth_predictor_multiview_360.py:91-157, automated as an allclose test).

    Scene: a world-static ERP texture painted on a sphere of radius R centered
    at the REFERENCE camera. The other camera sits at a translation t; the
    texture it observes is resampled analytically, and warping it back onto
    the reference view at candidate radius R must match the reference image
    away from bilinear-interp high-gradient pixels."""
    import jax
    import jax.numpy as jnp
    from splatter360_tpu.geometry import (
        cartesian_to_spherical, erp_ray_directions, spherical_to_erp,
    )
    from splatter360_tpu.models.costvolume import spherical_sweep_warp
    from splatter360_tpu.geometry.transforms import inverse_se3

    h, w, radius = 64, 128, 4.0

    def texture(dirs):
        # smooth world-direction texture: low-frequency SH-ish bands
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        return jnp.stack(
            [0.5 + 0.5 * x, 0.5 + 0.4 * y * z, 0.5 + 0.3 * (x * x - z * z)],
            axis=-1,
        )

    dirs = erp_ray_directions(h, w, jnp.float32)  # [h, w, 3] ref-camera dirs
    # reference camera at origin: surface point = R * dir
    img_ref = texture(dirs)

    # other camera translated by t (identity rotation): it sees surface points
    # p - t along direction normalize(p - t)
    t = jnp.array([0.6, -0.2, 0.4], jnp.float32)
    c2w_ref = jnp.eye(4)
    c2w_other = jnp.eye(4).at[:3, 3].set(t)

    # build the other view's image analytically: for each of ITS pixels, cast
    # a ray, intersect the sphere |o + s*d| = R with o = t (world == ref cam),
    # color by the world direction of the hit point.
    o = t
    d = dirs  # other camera axes == world axes
    b_half = jnp.einsum("hwj,j->hw", d, o)
    disc = jnp.sqrt(jnp.maximum(b_half**2 - (o @ o - radius**2), 0.0))
    s = -b_half + disc  # forward intersection
    hit = o + s[..., None] * d  # world point on the sphere
    img_other = texture(hit / jnp.linalg.norm(hit, axis=-1, keepdims=True))

    rel = inverse_se3(c2w_other) @ c2w_ref  # ref cam -> other cam
    warped = spherical_sweep_warp(
        img_other, rel, jnp.array([radius], jnp.float32)
    )[0]  # [h, w, 3]

    err = jnp.abs(warped - img_ref)
    # bilinear resampling error concentrates at the poles (ERP distortion);
    # the median over all pixels must be tight and the mean small
    assert float(jnp.median(err)) < 2e-3
    assert float(jnp.mean(err)) < 6e-3


def test_spherical_sweep_warp_identity():
    """Identity relative pose must return the source features exactly at any
    candidate radius (the reference's warp sanity assertion,
    depth_predictor_multiview_360.py:193)."""
    import jax
    import jax.numpy as jnp
    from splatter360_tpu.models.costvolume import spherical_sweep_warp

    h, w = 32, 64
    key = jax.random.PRNGKey(0)
    feats = jax.random.uniform(key, (h, w, 5), jnp.float32)
    out = spherical_sweep_warp(
        feats, jnp.eye(4), jnp.array([0.5, 3.0, 40.0], jnp.float32)
    )
    for d in range(3):
        assert float(jnp.max(jnp.abs(out[d] - feats))) < 1e-5


@pytest.mark.parametrize("v", [3, 4])
def test_encoder_multiview_contexts(v):
    """Reference parity: 3- and 4-context-view configs (the *_3views/_4views
    evaluation indices; cyclic-permutation cost volume averages over all other
    views, depth_predictor_multiview_360.py:299-329)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_batch, _tiny_encoder_cfg
    from splatter360_tpu.models.encoder import EncoderCostVolume360
    from splatter360_tpu.train.state import _context_cubes

    cfg = _tiny_encoder_cfg()
    enc = EncoderCostVolume360(cfg)
    h, w = 32, 64
    ctx = _make_batch(1, v, h, w)["context"]
    cubes = _context_cubes(jnp.asarray(ctx["image_sphere"]), h // 2)
    args = (
        jnp.asarray(ctx["image_sphere"]), cubes,
        jnp.asarray(ctx["extrinsics_sphere"]), jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]), 0,
    )
    params = enc.init(jax.random.PRNGKey(0), *args)
    g, depth = enc.apply(params, *args)
    assert g.means.shape == (1, v * h * w, 3)
    assert depth.shape == (1, v, h, w)
    assert bool(jnp.all(jnp.isfinite(g.means)))


@pytest.mark.parametrize("fusion", ["concat", "biproj"])
def test_fusion_variants(fusion):
    """Concat/BiProj cube-ERP fusion ablations (reference geometry/
    layers.py:119-151) produce valid Gaussians like the default CEE."""
    cfg = tiny_encoder_cfg(fusion_type=fusion)
    enc = EncoderCostVolume360(cfg)
    batch = tiny_batch()
    ctx = jax.tree_util.tree_map(jnp.asarray, batch["context"])
    from splatter360_tpu.train.state import _context_cubes

    cubes = _context_cubes(ctx["image_sphere"], H // 2)
    params = enc.init(
        jax.random.PRNGKey(0), ctx["image_sphere"], cubes,
        ctx["extrinsics_sphere"], ctx["near"], ctx["far"], 0,
    )
    gaussians, depth = enc.apply(
        params, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
        ctx["near"], ctx["far"], 0,
    )
    n = V * H * W
    assert gaussians.means.shape == (B, n, 3)
    assert np.isfinite(np.asarray(gaussians.means)).all()


def test_bf16_compute_parity():
    """model.bf16_compute trains within tolerance of f32 (mixed precision:
    bf16 MXU compute, f32 geometry/softmax islands + master params)."""
    batch = tiny_batch()
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=100),
        loss=LossConfig(lpips_weight=0.0, depth_weight=0.1),
        supervision="cubes", render_backend="jax",
    )
    losses = {}
    for bf16 in (False, True):
        cfg = tiny_encoder_cfg(bf16_compute=bf16)
        state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step = jax.jit(make_train_step(cfg, tcfg))
        for _ in range(2):
            state, m = step(state, batch)
        losses[bf16] = float(m["loss"])
        assert np.isfinite(losses[bf16])
        # gaussians leaving the encoder must be f32 (geometry precision)
        g, d = state.apply_fn(
            state.params,
            jnp.asarray(batch["context"]["image_sphere"]),
            jnp.zeros((B, V, 6, H // 2, H // 2, 3)),
            jnp.asarray(batch["context"]["extrinsics_sphere"]),
            jnp.asarray(batch["context"]["near"]),
            jnp.asarray(batch["context"]["far"]), 0,
        )
        assert g.means.dtype == jnp.float32
        assert g.covariances.dtype == jnp.float32
    assert abs(losses[True] - losses[False]) < 0.05 * abs(losses[False]) + 1e-3


def test_encoder_gaussians_per_pixel_2():
    """gaussians_per_pixel > 1 (reference costvolume.yaml surface): the gpp
    gaussians of a pixel share raw scale/rot/SH but take distinct depths and
    opacities (encoder_costvolume.py:404-426 broadcast), flattened gpp-
    fastest into the gaussian axis. Also trains one step end-to-end."""
    cfg = tiny_encoder_cfg(gaussians_per_pixel=2)
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=10),
        loss=LossConfig(depth_weight=0.1),
        supervision="cubes",
        render_backend="jax",
        max_per_tile=512,
    )
    batch = tiny_batch()
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    ctx = batch["context"]
    from splatter360_tpu.train.state import _context_cubes

    cubes = _context_cubes(jnp.asarray(ctx["image_sphere"]), H // 2)
    gaussians, depth = state.apply_fn(
        state.params, jnp.asarray(ctx["image_sphere"]), cubes,
        jnp.asarray(ctx["extrinsics_sphere"]), jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]), 0,
    )
    n = V * H * W * 2
    assert gaussians.means.shape == (B, n, 3)
    assert gaussians.covariances.shape == (B, n, 6)
    assert gaussians.opacities.shape == (B, n)
    assert depth.shape == (B, V, H, W)
    m = np.asarray(gaussians.means).reshape(B, V, H * W, 2, 3)
    o = np.asarray(gaussians.opacities).reshape(B, V, H * W, 2)
    # the pair shares the pixel ray: means are collinear with the camera
    # translation removed (same direction, different depth)
    c2w = np.asarray(ctx["extrinsics_sphere"])  # [B, V, 4, 4]
    rel = m - c2w[:, :, None, None, :3, 3]
    d0 = rel[..., 0, :] / np.linalg.norm(rel[..., 0, :], axis=-1, keepdims=True)
    d1 = rel[..., 1, :] / np.linalg.norm(rel[..., 1, :], axis=-1, keepdims=True)
    np.testing.assert_allclose(d0, d1, atol=1e-5)
    assert np.isfinite(o).all()

    # one full train step (render + losses + Adam) runs and yields finite loss
    step = jax.jit(make_train_step(cfg, tcfg))
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_encoder_gpp2_wo_depth_refine():
    """gpp > 1 with wo_depth_refine: the single coarse surface broadcasts
    across gpp (ADVICE r3: used to crash with an opaque reshape error)."""
    cfg = tiny_encoder_cfg(gaussians_per_pixel=2, wo_depth_refine=True)
    batch = tiny_batch()
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=10),
        supervision="cubes", render_backend="jax", max_per_tile=512,
    )
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    ctx = batch["context"]
    from splatter360_tpu.train.state import _context_cubes

    cubes = _context_cubes(jnp.asarray(ctx["image_sphere"]), H // 2)
    gaussians, depth = state.apply_fn(
        state.params, jnp.asarray(ctx["image_sphere"]), cubes,
        jnp.asarray(ctx["extrinsics_sphere"]), jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]), 0,
    )
    n = V * H * W * 2
    assert gaussians.means.shape == (B, n, 3)
    assert depth.shape == (B, V, H, W)
    # the broadcast pair shares the depth -> identical means
    m = np.asarray(gaussians.means).reshape(B, V, H * W, 2, 3)
    np.testing.assert_allclose(m[..., 0, :], m[..., 1, :], atol=1e-6)
