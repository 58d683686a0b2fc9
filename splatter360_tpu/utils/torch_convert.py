"""Torch-checkpoint -> flax parameter converters (warm-start parity tooling).

The reference warm-starts both multiview backbones from the UniMatch
`gmdepth-scale1-resumeflowthings-scannet` checkpoint (encoder_costvolume.py:141-179)
and loads DINOv2 via torch.hub (ref:107-125). This environment has zero egress, so
these converters map LOCAL torch state_dicts (or plain numpy dicts with torch-style
keys) onto our flax module trees; capability parity, exercised by unit tests with
synthetic state dicts.

Conventions: torch conv weights [out, in, kh, kw] -> flax [kh, kw, in, out];
torch Linear [out, in] -> flax Dense kernel [in, out].
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w):
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _dense(w):
    return jnp.asarray(_np(w).T)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "params"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def convert_unimatch_backbone(
    sd: Mapping[str, Any], num_layers: int = 6
) -> Dict[str, Any]:
    """UniMatch (backbone.py CNNEncoder + transformer) -> BackboneMultiview params.

    Accepts keys prefixed `backbone.` / `transformer.` (gmdepth checkpoints).
    Returns a partial params dict: {"CNNEncoder_0": ..., "MultiViewFeatureTransformer_0": ...}.
    """
    def k(name):  # tolerate both bare and prefixed keys
        for cand in (name, f"module.{name}"):
            if cand in sd:
                return sd[cand]
        raise KeyError(name)

    cnn: Dict[str, Any] = {
        "Conv_0": {"kernel": _conv(k("backbone.conv1.weight"))},
    }
    # 3 stages x 2 residual blocks, flax auto-names ResidualBlock_0..5
    blk = 0
    for stage in (1, 2, 3):
        for sub in (0, 1):
            prefix = f"backbone.layer{stage}.{sub}"
            entry = {
                "Conv_0": {"kernel": _conv(k(f"{prefix}.conv1.weight"))},
                "Conv_1": {"kernel": _conv(k(f"{prefix}.conv2.weight"))},
            }
            ds_w = f"{prefix}.downsample.0.weight"
            if ds_w in sd or f"module.{ds_w}" in sd:
                entry["Conv_2"] = {
                    "kernel": _conv(k(ds_w)),
                    "bias": jnp.asarray(_np(k(f"{prefix}.downsample.0.bias"))),
                }
            cnn[f"ResidualBlock_{blk}"] = entry
            blk += 1
    cnn["Conv_1"] = {
        "kernel": _conv(k("backbone.conv2.weight")),
        "bias": jnp.asarray(_np(k("backbone.conv2.bias"))),
    }

    trans: Dict[str, Any] = {}
    for i in range(num_layers):
        for ours, theirs in (
            (f"layer{i}_self", f"transformer.layers.{i}.self_attn"),
            (f"layer{i}_cross", f"transformer.layers.{i}.cross_attn_ffn"),
        ):
            entry = {
                "q_proj": {"kernel": _dense(k(f"{theirs}.q_proj.weight"))},
                "k_proj": {"kernel": _dense(k(f"{theirs}.k_proj.weight"))},
                "v_proj": {"kernel": _dense(k(f"{theirs}.v_proj.weight"))},
                "merge": {"kernel": _dense(k(f"{theirs}.merge.weight"))},
                "norm1": {
                    "scale": jnp.asarray(_np(k(f"{theirs}.norm1.weight"))),
                    "bias": jnp.asarray(_np(k(f"{theirs}.norm1.bias"))),
                },
            }
            mlp0 = f"{theirs}.mlp.0.weight"
            if mlp0 in sd or f"module.{mlp0}" in sd:
                entry["Dense_0"] = {"kernel": _dense(k(mlp0))}
                entry["Dense_1"] = {"kernel": _dense(k(f"{theirs}.mlp.2.weight"))}
                entry["norm2"] = {
                    "scale": jnp.asarray(_np(k(f"{theirs}.norm2.weight"))),
                    "bias": jnp.asarray(_np(k(f"{theirs}.norm2.bias"))),
                }
            trans[ours] = entry

    return {
        "CNNEncoder_0": cnn,
        "MultiViewFeatureTransformer_0": trans,
    }


def convert_dinov2(sd: Mapping[str, Any], grid_hw=(18, 18)) -> Dict[str, Any]:
    """DINOv2 torch state_dict -> DinoViT params (drops CLS/mask tokens; pos_embed
    bilinearly resampled from the checkpoint grid to `grid_hw`)."""
    import jax

    dim = _np(sd["patch_embed.proj.weight"]).shape[0]
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        },
        "norm": {
            "scale": jnp.asarray(_np(sd["norm.weight"])),
            "bias": jnp.asarray(_np(sd["norm.bias"])),
        },
    }
    # positional embedding: [1, 1 + g*g, C] with CLS first
    pe = _np(sd["pos_embed"])[0]
    patch_pe = pe[1:]
    g = int(round(np.sqrt(patch_pe.shape[0])))
    patch_pe = patch_pe.reshape(1, g, g, dim)
    gh, gw = grid_hw
    patch_pe = jax.image.resize(
        jnp.asarray(patch_pe), (1, gh, gw, dim), method="bilinear"
    )
    out["pos_embed"] = patch_pe.reshape(1, gh * gw, dim)

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p = f"blocks.{i}"
        qkv_w = _np(sd[f"{p}.attn.qkv.weight"])  # [3C, C]
        qkv_b = _np(sd[f"{p}.attn.qkv.bias"])
        heads = dim // 64
        hd = dim // heads

        def split_head(w, b, sel):
            w_sel = w[sel * dim : (sel + 1) * dim]  # [C, C]
            b_sel = b[sel * dim : (sel + 1) * dim]
            return {
                "kernel": jnp.asarray(w_sel.T.reshape(dim, heads, hd)),
                "bias": jnp.asarray(b_sel.reshape(heads, hd)),
            }

        proj_w = _np(sd[f"{p}.attn.proj.weight"])
        out[f"block{i}"] = {
            "LayerNorm_0": {
                "scale": jnp.asarray(_np(sd[f"{p}.norm1.weight"])),
                "bias": jnp.asarray(_np(sd[f"{p}.norm1.bias"])),
            },
            "MultiHeadDotProductAttention_0": {
                "query": split_head(qkv_w, qkv_b, 0),
                "key": split_head(qkv_w, qkv_b, 1),
                "value": split_head(qkv_w, qkv_b, 2),
                "out": {
                    "kernel": jnp.asarray(
                        proj_w.T.reshape(heads, hd, dim)
                    ),
                    "bias": jnp.asarray(_np(sd[f"{p}.attn.proj.bias"])),
                },
            },
            "ls1": jnp.asarray(_np(sd[f"{p}.ls1.gamma"])),
            "LayerNorm_1": {
                "scale": jnp.asarray(_np(sd[f"{p}.norm2.weight"])),
                "bias": jnp.asarray(_np(sd[f"{p}.norm2.bias"])),
            },
            "Dense_0": {
                "kernel": _dense(sd[f"{p}.mlp.fc1.weight"]),
                "bias": jnp.asarray(_np(sd[f"{p}.mlp.fc1.bias"])),
            },
            "Dense_1": {
                "kernel": _dense(sd[f"{p}.mlp.fc2.weight"]),
                "bias": jnp.asarray(_np(sd[f"{p}.mlp.fc2.bias"])),
            },
            "ls2": jnp.asarray(_np(sd[f"{p}.ls2.gamma"])),
        }
        i += 1
    return out
