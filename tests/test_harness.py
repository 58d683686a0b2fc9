"""Unit tests for config/metrics/losses/samplers/io/checkpoint components."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_config_roundtrip(tmp_path):
    from splatter360_tpu.config import RootConfig, load_config

    cfg = load_config(None, ["mode=test", "model.d_feature=64",
                             "train.optimizer.lr=1e-3",
                             "dataset.image_shape=[64,128]"])
    assert cfg.mode == "test"
    assert cfg.model.d_feature == 64
    assert cfg.train.optimizer.lr == pytest.approx(1e-3)
    assert tuple(cfg.dataset.image_shape) == (64, 128)

    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("mode: train\nmodel:\n  num_depth_candidates: 32\n")
    cfg2 = load_config(str(yaml_path), ["trainer.max_steps=5"])
    assert cfg2.model.num_depth_candidates == 32
    assert cfg2.trainer.max_steps == 5

    with pytest.raises(KeyError):
        load_config(None, ["model.not_a_key=1"])


def test_psnr_known_value():
    from splatter360_tpu.train.metrics import compute_psnr

    gt = jnp.zeros((1, 8, 8, 3))
    pred = jnp.full((1, 8, 8, 3), 0.1)
    psnr = float(compute_psnr(gt, pred)[0])
    assert psnr == pytest.approx(20.0, abs=1e-3)  # mse = 0.01
    assert float(compute_psnr(gt, gt)[0]) == pytest.approx(100.0, abs=1.0)


def test_ssim_identity_and_noise():
    from splatter360_tpu.train.metrics import compute_ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    s_same = float(compute_ssim(jnp.asarray(img), jnp.asarray(img))[0])
    assert s_same == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s_noisy = float(compute_ssim(jnp.asarray(img), jnp.asarray(noisy))[0])
    assert 0.0 < s_noisy < 0.9


def test_depth_metrics_perfect():
    from splatter360_tpu.train.metrics import compute_depth_metrics

    d = jnp.ones((4, 4)) * 2.0
    m = compute_depth_metrics(d, d, jnp.ones((4, 4), bool))
    assert float(m["abs_rel"]) == 0.0
    assert float(m["a25"]) == pytest.approx(100.0)


def test_sin_weighted_depth_l1():
    from splatter360_tpu.train.losses import sin_weighted_depth_l1

    gt = jnp.full((1, 1, 16, 32), 2.0)
    pred = jnp.full((1, 1, 16, 32), 2.5)
    far = jnp.full((1, 1), 10.0)
    loss = float(sin_weighted_depth_l1(pred, gt, far))
    assert loss == pytest.approx(0.5, abs=1e-5)
    # holes (gt=0) masked out -> zero-weight rows don't contribute
    gt_holes = gt.at[..., :8].set(0.0)
    loss2 = float(sin_weighted_depth_l1(pred, gt_holes, far))
    assert np.isfinite(loss2)


def test_bounded_sampler_curriculum():
    from splatter360_tpu.data.view_sampler import (
        BoundedSamplerConfig, ViewSamplerBounded,
    )

    cfg = BoundedSamplerConfig(
        num_context_views=2, num_target_views=3,
        min_distance_between_context_views=10,
        max_distance_between_context_views=40,
        warm_up_steps=100,
        initial_min_distance_between_context_views=2,
        initial_max_distance_between_context_views=5,
    )
    s = ViewSamplerBounded(cfg)
    rng = np.random.default_rng(0)
    for step, lo, hi in ((0, 1, 5), (100, 10, 40)):
        for _ in range(20):
            ctx, tgt = s.sample(200, rng, global_step=step)
            gap = ctx[-1] - ctx[0]
            assert lo <= gap <= hi
            assert (tgt >= ctx[0]).all() and (tgt <= ctx[-1]).all()
            assert len(set(tgt.tolist())) == len(tgt)
    s_test = ViewSamplerBounded(cfg, stage="test")
    ctx, tgt = s_test.sample(200, rng)
    # frame-40 start (reference evaluation_index_generator.py:116-127)
    assert ctx[0] == 40 and ctx[-1] == 80


def test_evaluation_sampler(tmp_path):
    from splatter360_tpu.data.view_sampler import ViewSamplerEvaluation

    idx = {"scene_a": {"context": [40, 140], "target": [50, 90]}}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(idx))
    s = ViewSamplerEvaluation(str(p))
    ctx, tgt = s.sample("scene_a")
    assert ctx.tolist() == [40, 140]
    assert s.sample("missing") is None


def test_scene_io_roundtrip(tmp_path):
    from splatter360_tpu.data.scene_io import save_scene, load_scene, list_scenes

    rgb = np.random.default_rng(0).integers(0, 255, (4, 8, 16, 3), np.uint8)
    depth = np.random.default_rng(1).integers(0, 5000, (4, 8, 16)).astype(np.uint16)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    save_scene(tmp_path, "train", "s0", rgb, depth, poses)
    assert list_scenes(tmp_path, "train") == ["s0"]
    data = load_scene(tmp_path, "train", "s0")
    np.testing.assert_array_equal(data["rgb"], rgb)
    np.testing.assert_allclose(data["depth_m"], depth / 1000.0, rtol=1e-6)


def test_index_generator(tmp_path):
    from splatter360_tpu.data.scene_io import save_scene
    from splatter360_tpu.evaluation.index_generator import (
        IndexGeneratorConfig, generate_index,
    )

    rgb = np.zeros((60, 4, 8, 3), np.uint8)
    depth = np.zeros((60, 4, 8), np.uint16)
    poses = np.tile(np.eye(4, dtype=np.float32), (60, 1, 1))
    save_scene(tmp_path, "test", "sc", rgb, depth, poses)
    idx = generate_index(
        [str(tmp_path)], "test", str(tmp_path / "idx.json"),
        IndexGeneratorConfig(context_start=10, frame_interval=30,
                             num_target_views=3),
    )
    assert idx["sc"]["context"] == [10, 40]
    assert len(idx["sc"]["target"]) == 3
    assert all(10 < t < 40 for t in idx["sc"]["target"])


def test_ply_export(tmp_path):
    from splatter360_tpu.utils.ply_export import export_ply

    n = 5
    export_ply(
        np.zeros((n, 3)), np.ones((n, 3)) * 0.1,
        np.tile([0, 0, 0, 1.0], (n, 1)), np.zeros((n, 3, 25)),
        np.full((n,), 0.5), tmp_path / "g.ply",
    )
    raw = (tmp_path / "g.ply").read_bytes()
    assert raw.startswith(b"ply\n")
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    assert len(raw) - header_end == n * 17 * 4  # 17 float properties


def test_checkpoint_roundtrip(tmp_path):
    import optax
    from flax import struct

    from splatter360_tpu.train import checkpoint as ckpt
    from splatter360_tpu.train.state import TrainState

    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))}}
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.asarray(7), params=params, opt_state=tx.init(params), tx=tx,
    )
    ckpt.save_checkpoint(str(tmp_path / "ck"), 7, state)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7

    fresh = TrainState(
        step=jnp.asarray(0),
        params=jax.tree_util.tree_map(jnp.zeros_like, params),
        opt_state=tx.init(params), tx=tx,
    )
    restored, ok = ckpt.restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert ok and int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["dense"]["kernel"]), np.ones((3, 3))
    )
    wo, ok = ckpt.restore_weights_only(str(tmp_path / "ck"), fresh)
    assert ok and int(wo.step) == 0


def test_partial_warm_start():
    from splatter360_tpu.train.checkpoint import partial_warm_start

    params = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)), "c": jnp.zeros((4,))}
    donor = {"a": jnp.ones((2, 2)), "b": jnp.ones((5,)), "d": jnp.ones((1,))}
    merged = partial_warm_start(params, {"a": donor["a"], "b": donor["b"],
                                          "c": jnp.ones((4,))})
    np.testing.assert_array_equal(np.asarray(merged["a"]), 1.0)  # shape match
    np.testing.assert_array_equal(np.asarray(merged["b"]), 0.0)  # shape mismatch
    np.testing.assert_array_equal(np.asarray(merged["c"]), 1.0)


def test_lpips_shapes_and_identity():
    from splatter360_tpu.train.lpips_jax import LPIPS

    lpips = LPIPS()
    x = jnp.linspace(0, 1, 1 * 32 * 32 * 3).reshape(1, 32, 32, 3)
    params = lpips.init(jax.random.PRNGKey(0), x, x)
    d_same = lpips.apply(params, x, x)
    assert d_same.shape == (1,)
    assert float(d_same[0]) == pytest.approx(0.0, abs=1e-6)
    y = jnp.flip(x, axis=2)
    assert float(lpips.apply(params, x, y)[0]) > 0.0


def test_lpips_torch_conversion_real_layout(tmp_path):
    """Convert from the EXACT key layout of richzhang/PerceptualSimilarity's
    LPIPS(net='vgg') state_dict (net.slice{1..5}.{torch_idx}.weight/bias +
    lins.{i}.model.1.weight) — the file `lpips` saves and the reference loads
    (src/loss/loss_lpips.py:28-38)."""
    import numpy as np
    import torch

    from splatter360_tpu.train.lpips_jax import (
        LPIPS, load_lpips_torch_weights, make_lpips_fn,
    )

    torch.manual_seed(0)
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    conv_idx = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
    lin_ch = [64, 128, 256, 512, 512]
    sd = {}
    ci = 0
    for si, idxs in enumerate(conv_idx):
        for ti in idxs:
            cin, cout = cfg[ci]
            sd[f"net.slice{si + 1}.{ti}.weight"] = torch.randn(cout, cin, 3, 3)
            sd[f"net.slice{si + 1}.{ti}.bias"] = torch.randn(cout)
            ci += 1
    for i, ch in enumerate(lin_ch):
        sd[f"lins.{i}.model.1.weight"] = torch.rand(1, ch, 1, 1)
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, path)

    lpips = LPIPS()
    x = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    params = lpips.init(jax.random.PRNGKey(0), x, x)
    converted = load_lpips_torch_weights(params, path)
    # every converted tensor matches the torch source exactly
    k = np.asarray(converted["params"]["vgg"]["conv0_0"]["kernel"])
    np.testing.assert_allclose(
        k, sd["net.slice1.0.weight"].numpy().transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(
        np.asarray(converted["params"]["lin2"]),
        sd["lins.2.model.1.weight"].numpy()[0, :, 0, 0],
    )
    # converted weights change the metric vs the seeded init
    y = jnp.flip(x, axis=2)
    d_seeded = float(lpips.apply(params, x, y)[0])
    d_conv = float(lpips.apply(converted, x, y)[0])
    assert d_conv != pytest.approx(d_seeded)
    # the factory returns a deterministic jitted fn (same numbers every call)
    fn = make_lpips_fn(path)
    assert float(fn(x, y)[0]) == pytest.approx(d_conv, rel=1e-5)


def test_pose_video_interpolation_chain():
    from splatter360_tpu.geometry import interpolate_pose_6d

    a = jnp.eye(4)
    b = jnp.eye(4).at[:3, 3].set(jnp.array([2.0, 0.0, 0.0]))
    mid = interpolate_pose_6d(a, b, 0.5)
    np.testing.assert_allclose(np.asarray(mid[:3, 3]), [1.0, 0.0, 0.0], atol=1e-6)


def test_data_mesh_size():
    from splatter360_tpu.parallel.mesh import data_mesh_size

    # batch must divide across the mesh (shard_batch hard-errors otherwise):
    # batch 1 on 8 devices -> 1-device mesh; batch scales WITH devices as in
    # the reference's per-GPU-batch DDP (SURVEY.md §2.10).
    assert data_mesh_size(1, 8) == 1
    assert data_mesh_size(2, 8) == 2
    assert data_mesh_size(8, 8) == 8
    assert data_mesh_size(6, 8) == 6
    assert data_mesh_size(12, 8) == 6
    assert data_mesh_size(16, 8) == 8
    assert data_mesh_size(0, 8) == 1  # degenerate inputs clamp safely
    assert data_mesh_size(4, 0) == 1


def test_data_mesh_size_warns_on_shrink():
    import warnings

    from splatter360_tpu.parallel.mesh import data_mesh_size

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert data_mesh_size(3, 8) == 3
    assert any("IDLE" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert data_mesh_size(8, 8) == 8
    assert not rec


def test_local_batch_size(monkeypatch):
    import jax

    from splatter360_tpu.parallel import mesh as mesh_mod

    assert mesh_mod.local_batch_size(4) == 4  # single process: full batch
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert mesh_mod.local_batch_size(8) == 2
    with pytest.raises(ValueError, match="divisible by the process count"):
        mesh_mod.local_batch_size(6)


def test_multihost_batch_assembly_matches_device_put():
    """jax.make_array_from_process_local_data (the multi-host shard_batch
    path) must agree with plain device_put sharding on the virtual mesh."""
    import jax

    from splatter360_tpu.parallel.mesh import create_mesh, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(8)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    via_put = shard_batch(mesh, {"x": x})["x"]
    via_global = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x
    )
    assert via_global.sharding.is_equivalent_to(via_put.sharding, x.ndim)
    np.testing.assert_array_equal(np.asarray(via_global), np.asarray(via_put))


def test_bounded_sampler_test_mode_frame40():
    """Test mode starts the left context at frame 40 (reference protocol,
    evaluation_index_generator.py:116-127), clamped for short scenes."""
    import numpy as np

    from splatter360_tpu.data.view_sampler import (
        BoundedSamplerConfig, ViewSamplerBounded,
    )

    cfg = BoundedSamplerConfig(max_distance_between_context_views=100)
    s = ViewSamplerBounded(cfg, stage="test")
    rng = np.random.default_rng(0)
    ctx, tgt = s.sample(200, rng)
    assert ctx[0] == 40 and ctx[-1] == 140
    # short scene: clamp start so the full gap still fits
    ctx, tgt = s.sample(120, rng)
    assert ctx[0] == 19 and ctx[-1] == 119
    # shorter than the gap: gap shrinks to the scene, start 0
    ctx, tgt = s.sample(50, rng)
    assert ctx[0] == 0 and ctx[-1] == 49


def test_wandb_checkpoint_uri_local_store(tmp_path, monkeypatch):
    """wandb:// URIs resolve through the local artifact store when the wandb
    API is unreachable (zero egress; reference wandb_tools.py:42-62)."""
    from splatter360_tpu.train.checkpoint import resolve_checkpoint_uri

    store = tmp_path / "artifacts"
    for v in ("v1", "v3", "v10"):
        (store / "run7" / v).mkdir(parents=True)
    monkeypatch.setenv("SPLAT360_WANDB_ARTIFACTS", str(store))
    monkeypatch.delenv("WANDB_API_KEY", raising=False)

    # latest version wins when none requested (v10 > v3 numerically)
    assert resolve_checkpoint_uri("wandb://run7").endswith("run7/v10")
    assert resolve_checkpoint_uri("wandb://run7:v3").endswith("run7/v3")
    # non-wandb paths pass through
    assert resolve_checkpoint_uri("/a/b") == "/a/b"
    assert resolve_checkpoint_uri(None) is None
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_uri("wandb://missing_run")
    with pytest.raises(ValueError):
        resolve_checkpoint_uri("wandb://run7:v1:v2")
