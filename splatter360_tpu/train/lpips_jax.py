"""LPIPS (VGG16 backbone) in flax — perceptual loss + metric.

Replaces the reference's `lpips` torch package (loss_lpips.py:28-55, metrics.py:25-38).
Architecture matches richzhang/PerceptualSimilarity's VGG variant: VGG16 conv features
at relu1_2/2_2/3_3/4_3/5_3, channel-unit-normalize, learned 1x1 linear heads, spatial
mean, sum over layers. Inputs are [0, 1] images, internally shifted/scaled by the
LPIPS constants.

Weights: this environment has no torchvision/lpips and zero egress, so parameters are
converted from local torch checkpoints when available (load_lpips_torch_weights) and
otherwise randomly initialized — clearly flagged, since metric parity requires the
released weights. Random VGG features still provide a usable perceptual training
signal (the loss path), and the architecture/test coverage is weight-independent.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_VGG_CFG = (
    (64, 64),            # -> relu1_2
    (128, 128),          # -> relu2_2
    (256, 256, 256),     # -> relu3_3
    (512, 512, 512),     # -> relu4_3
    (512, 512, 512),     # -> relu5_3
)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for si, stage in enumerate(_VGG_CFG):
            for ci, ch in enumerate(stage):
                x = nn.Conv(ch, (3, 3), name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
            if si != len(_VGG_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img0, img1):
        """img0, img1: [B, H, W, 3] in [0, 1]. Returns [B] distances."""
        shift = jnp.asarray(_SHIFT, img0.dtype)
        scale = jnp.asarray(_SCALE, img0.dtype)

        def norm_input(x):
            return (2.0 * x - 1.0 - shift) / scale

        vgg = VGG16Features(name="vgg")
        f0 = vgg(norm_input(img0))
        f1 = vgg(norm_input(img1))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(
                f"lin{i}",
                nn.initializers.constant(1.0 / d.shape[-1]),
                (d.shape[-1],),
            )
            total = total + jnp.mean(
                jnp.sum(d * jnp.abs(w), axis=-1), axis=(-2, -1)
            )
        return total


def make_lpips_fn(weights_path: str | None = None):
    """Jitted LPIPS distance fn(pred [B,H,W,3] in [0,1], gt) -> [B].

    Weights come from a torch LPIPS(net='vgg') / torchvision-vgg16 checkpoint
    when `weights_path` is given (load_lpips_torch_weights). Otherwise the
    features are DETERMINISTIC seeded-random (PRNGKey(0)) — a loud deviation
    from the reference protocol (src/evaluation/metrics.py:25-38 uses the
    released VGG-LPIPS weights, unavailable here: zero egress, no local
    checkpoint): the numbers are stable across runs and usable for relative
    comparison / regression tracking, but NOT comparable to published LPIPS.
    Pass the real checkpoint via `train.loss.lpips_weights` for parity."""
    import jax

    lpips = LPIPS()
    probe = jnp.zeros((1, 64, 64, 3))
    params = lpips.init(jax.random.PRNGKey(0), probe, probe)
    if weights_path:
        params = load_lpips_torch_weights(params, weights_path)
    else:
        import sys

        print(
            "warning: LPIPS using seeded-random VGG features (no weights "
            "checkpoint) — values are run-stable but not comparable to "
            "published LPIPS; set train.loss.lpips_weights for parity.",
            file=sys.stderr,
        )
    return jax.jit(lambda a, b: lpips.apply(params, a, b))


def load_lpips_torch_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Convert a torch LPIPS(net='vgg') state_dict file into our param pytree."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    p = params["params"]
    # torch vgg features indices of conv layers per stage
    conv_idx = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
    for si, idxs in enumerate(conv_idx):
        for ci, ti in enumerate(idxs):
            wkey = f"net.slice{si + 1}.{ti}.weight"
            bkey = f"net.slice{si + 1}.{ti}.bias"
            if wkey not in sd:  # raw torchvision layout fallback
                wkey = f"features.{ti}.weight"
                bkey = f"features.{ti}.bias"
            w = np.asarray(sd[wkey])  # [out, in, kh, kw]
            p["vgg"][f"conv{si}_{ci}"]["kernel"] = jnp.asarray(
                w.transpose(2, 3, 1, 0)
            )
            p["vgg"][f"conv{si}_{ci}"]["bias"] = jnp.asarray(sd[bkey])
    for i in range(5):
        lk = f"lins.{i}.model.1.weight"
        if lk in sd:
            p[f"lin{i}"] = jnp.asarray(np.asarray(sd[lk])[0, :, 0, 0])
    return params
