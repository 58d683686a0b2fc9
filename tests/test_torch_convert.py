"""Weight converters: synthetic torch-style state dicts -> flax params that load and
produce matching shapes (no real checkpoints in this environment — zero egress)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatter360_tpu.models.backbone import BackboneMultiview
from splatter360_tpu.models.dino import DinoViT
from splatter360_tpu.train.checkpoint import partial_warm_start
from splatter360_tpu.utils.torch_convert import (
    convert_dinov2,
    convert_unimatch_backbone,
)


def _fake_unimatch_sd(c=32, layers=2):
    rng = np.random.default_rng(0)
    sd = {}
    dims = [64, 96, 128]  # fixed UniMatch CNN dims (mirrored by our CNNEncoder)
    sd["backbone.conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    in_planes = 64
    for stage, dim in enumerate(dims, start=1):
        for sub in (0, 1):
            p = f"backbone.layer{stage}.{sub}"
            inp = in_planes if sub == 0 else dim
            sd[f"{p}.conv1.weight"] = rng.normal(size=(dim, inp, 3, 3)).astype(np.float32)
            sd[f"{p}.conv2.weight"] = rng.normal(size=(dim, dim, 3, 3)).astype(np.float32)
            if sub == 0 and (stage > 1 or inp != dim):
                sd[f"{p}.downsample.0.weight"] = rng.normal(size=(dim, inp, 1, 1)).astype(np.float32)
                sd[f"{p}.downsample.0.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        in_planes = dim
    sd["backbone.conv2.weight"] = rng.normal(size=(c, 128, 1, 1)).astype(np.float32)
    sd["backbone.conv2.bias"] = rng.normal(size=(c,)).astype(np.float32)
    for i in range(layers):
        for attn in ("self_attn", "cross_attn_ffn"):
            p = f"transformer.layers.{i}.{attn}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                sd[f"{p}.{proj}.weight"] = rng.normal(size=(c, c)).astype(np.float32)
            sd[f"{p}.norm1.weight"] = np.ones(c, np.float32)
            sd[f"{p}.norm1.bias"] = np.zeros(c, np.float32)
            if attn == "cross_attn_ffn":
                sd[f"{p}.mlp.0.weight"] = rng.normal(size=(8 * c, 2 * c)).astype(np.float32)
                sd[f"{p}.mlp.2.weight"] = rng.normal(size=(c, 8 * c)).astype(np.float32)
                sd[f"{p}.norm2.weight"] = np.ones(c, np.float32)
                sd[f"{p}.norm2.bias"] = np.zeros(c, np.float32)
    return sd


def test_unimatch_conversion_loads():
    c = 32
    model = BackboneMultiview(
        feature_channels=c, num_transformer_layers=2, downscale_factor=8
    )
    x = jnp.zeros((1, 2, 32, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    donor = {"params": convert_unimatch_backbone(_fake_unimatch_sd(c), 2)}
    merged = partial_warm_start(params, donor)
    # stem conv must have been replaced (shape match) — check one leaf
    got = np.asarray(
        merged["params"]["CNNEncoder_0"]["Conv_0"]["kernel"]
    )
    want = _fake_unimatch_sd(c)["backbone.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # q_proj of layer 0 self-attn replaced
    got_q = np.asarray(
        merged["params"]["MultiViewFeatureTransformer_0"]["layer0_self"][
            "q_proj"
        ]["kernel"]
    )
    assert got_q.shape == (c, c)
    # and the model still runs with merged params
    out, cnn = model.apply(merged, x)
    assert out.shape == (1, 2, 4, 8, c)


def _fake_dino_sd(dim=64, depth=2, grid=9, patch=14):
    rng = np.random.default_rng(1)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, patch, patch)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(dim, np.float32),
        "pos_embed": rng.normal(size=(1, 1 + grid * grid, dim)).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.ls1.gamma"] = np.full(dim, 1e-5, np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        sd[f"{p}.ls2.gamma"] = np.full(dim, 1e-5, np.float32)
    return sd


def test_dinov2_conversion_loads():
    import splatter360_tpu.models.dino as dino_mod

    # small synthetic "vit": dim 64 -> heads 1, depth 2
    dino_mod.VIT_DIMS["test"] = (64, 1, 2)
    model = DinoViT(vit_type="test")
    x = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    converted = convert_dinov2(_fake_dino_sd(), grid_hw=(2, 2))
    merged = partial_warm_start(params, {"params": converted})
    out = model.apply(merged, x)
    assert out.shape == (1, 2, 2, 64)
    # pos_embed got resampled into our grid shape and loaded
    np.testing.assert_equal(
        np.asarray(merged["params"]["pos_embed"]).shape, (1, 4, 64)
    )
    got = np.asarray(merged["params"]["block0"]["ls1"])
    np.testing.assert_allclose(got, 1e-5, atol=1e-8)


def test_unimatch_conversion_real_key_layout():
    """Conversion against the REAL gmdepth checkpoint key layout.

    tests/data/unimatch_state_dict_keys.json is the exact state_dict()
    key->shape map of the reference's BackboneMultiview submodules
    (CNNEncoder(output_dim=128) + MultiViewFeatureTransformer(6 layers,
    d=128) — what `torch.load(ckpt)["model"]` provides and
    encoder_costvolume.py:141-179 filters into both backbones). Every key
    must be consumed by the converter and the converted tree must load into
    the full-size flax model.
    """
    import json
    from pathlib import Path

    keys = json.loads(
        (Path(__file__).parent / "data/unimatch_state_dict_keys.json")
        .read_text()
    )
    assert len(keys) == 115  # authoritative layout size
    rng = np.random.default_rng(0)

    accessed = set()

    class RecordingSD(dict):
        def __getitem__(self, k):
            accessed.add(k)
            return super().__getitem__(k)

        def __contains__(self, k):
            return super().__contains__(k)

    sd = RecordingSD(
        {k: rng.normal(size=s).astype(np.float32) for k, s in keys.items()}
    )
    converted = convert_unimatch_backbone(sd, num_layers=6)
    missed = set(keys) - accessed
    assert not missed, f"converter ignored real checkpoint keys: {missed}"

    model = BackboneMultiview(
        feature_channels=128, num_transformer_layers=6, downscale_factor=8
    )
    x = jnp.zeros((1, 2, 32, 64, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    # shape-level warm start: every converted leaf must match a model leaf
    flat_model = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    model_shapes = {
        jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat_model
    }
    flat_conv = jax.tree_util.tree_flatten_with_path(converted)[0]
    for p, v in flat_conv:
        ks = jax.tree_util.keystr(p)
        assert ks in model_shapes, f"converted leaf {ks} not in model"
        assert model_shapes[ks] == tuple(v.shape), (
            f"{ks}: model {model_shapes[ks]} vs converted {v.shape}"
        )


def test_dinov2_conversion_tolerates_real_extra_keys():
    """The real DINOv2 ViT-S/14 state dict also carries cls_token /
    mask_token / (register_tokens); the converter must drop them cleanly."""
    sd = _fake_dino_sd()
    sd["cls_token"] = np.zeros((1, 1, 64), np.float32)
    sd["mask_token"] = np.zeros((1, 64), np.float32)
    sd["register_tokens"] = np.zeros((1, 4, 64), np.float32)
    converted = convert_dinov2(sd, grid_hw=(2, 2))
    assert "cls_token" not in converted
    assert converted["pos_embed"].shape == (1, 4, 64)


def test_warm_start_backbones_end_to_end(tmp_path):
    """Config-path warm start: a REAL torch .pth file on disk -> converted ->
    grafted into BOTH encoder backbones (checkpointing.pretrained_backbone
    wiring; reference encoder_costvolume.py:141-179 loads the same UniMatch
    weights into backbone and backbone_erp)."""
    torch = pytest.importorskip("torch")
    from splatter360_tpu.models.encoder import (
        EncoderConfig, EncoderCostVolume360,
    )
    from splatter360_tpu.models.adapter import GaussianAdapterConfig
    from splatter360_tpu.train.checkpoint import warm_start_backbones

    c = 32
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _fake_unimatch_sd(c, layers=6).items()}
    path = tmp_path / "gmdepth.pth"
    torch.save({"model": sd}, path)

    cfg = EncoderConfig(
        d_feature=c, num_depth_candidates=8, downscale_factor=8,
        costvolume_unet_feat_dim=16, costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,), depth_unet_feat_dim=8,
        depth_unet_attn_res=(8,), depth_unet_channel_mult=(1, 1, 1),
        gaussian_adapter=GaussianAdapterConfig(sh_degree=1),
    )
    enc = EncoderCostVolume360(cfg)
    h, w, b, v = 32, 64, 1, 2
    img = jnp.zeros((b, v, h, w, 3))
    cubes = jnp.zeros((b, v, 6, h // 2, h // 2, 3))
    ext = jnp.tile(jnp.eye(4), (b, v, 1, 1))
    near = jnp.full((b, v), 0.1)
    far = jnp.full((b, v), 10.0)
    params = enc.init(jax.random.PRNGKey(0), img, cubes, ext, near, far, 0)

    merged, n = warm_start_backbones(params, str(path))
    assert n > 0
    # both backbones carry the SAME donor stem conv now
    want = _fake_unimatch_sd(c)["backbone.conv1.weight"].transpose(2, 3, 1, 0)
    for bb in ("backbone_cube", "backbone_erp"):
        got = np.asarray(merged["params"][bb]["CNNEncoder_0"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(got, want, atol=1e-6)
    # a 0-match donor fails loudly
    with pytest.raises(ValueError, match="0 parameter leaves"):
        warm_start_backbones({"params": {}}, str(path))


def test_warm_start_mono_end_to_end(tmp_path):
    """checkpointing.pretrained_mono wiring: torch ViT .pth -> frozen dino
    module, pos_embed resampled to the model's token grid."""
    torch = pytest.importorskip("torch")
    import splatter360_tpu.models.dino as dino_mod
    from splatter360_tpu.train.checkpoint import warm_start_mono

    dino_mod.VIT_DIMS["test"] = (64, 1, 2)
    model = DinoViT(vit_type="test")
    x = jnp.zeros((1, 28, 28, 3))
    inner = model.init(jax.random.PRNGKey(0), x)
    params = {"params": {"dino": inner["params"]}}

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in _fake_dino_sd().items()}
    path = tmp_path / "dinov2_vits14.pth"
    torch.save(sd, path)
    merged, n = warm_start_mono(params, str(path))
    assert n > 0
    assert np.asarray(merged["params"]["dino"]["pos_embed"]).shape == (1, 4, 64)
    with pytest.raises(ValueError, match="add_mono_feat"):
        warm_start_mono({"params": {}}, str(path))
