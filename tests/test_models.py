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
    assert gaussians.covariances.shape == (B, n, 3, 3)
    assert gaussians.harmonics.shape == (B, n, 3, 4)  # sh_degree 1
    assert gaussians.opacities.shape == (B, n)
    assert depth.shape == (B, V, H, W)
    d = np.asarray(depth)
    assert (d >= 0.1 - 1e-5).all() and (d <= 10.0 + 1e-5).all()
    assert np.isfinite(np.asarray(gaussians.means)).all()
    # covariances PSD
    evals = np.linalg.eigvalsh(np.asarray(gaussians.covariances[0, :50]))
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
