"""Common flax building blocks (NHWC, TPU-idiomatic).

Re-implements the reference's fusion/normalization primitives:
  * SELayer / CEELayer (UniFuse-style cube-ERP fusion, geometry/layers.py:153-198)
  * instance-norm residual blocks of the UniMatch CNN (unimatch/backbone.py:6-36)
All modules are channels-last.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Per-channel, per-sample spatial normalization (torch InstanceNorm2d parity,
    affine=False by default in torch — no learned scale/bias)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.epsilon)


class ResidualBlock(nn.Module):
    """UniMatch residual block (backbone.py:6-36): two 3x3 convs + instance norm."""

    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation), use_bias=False,
        )(x)
        y = nn.relu(InstanceNorm()(y))
        y = nn.Conv(
            self.planes, (3, 3), kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
        )(y)
        y = nn.relu(InstanceNorm()(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride))(x)
            x = InstanceNorm()(x)
        return nn.relu(x + y)


class SELayer(nn.Module):
    """Squeeze-and-excitation channel attention (geometry/layers.py:153-168)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(-3, -2))  # [..., C]
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        return x * y[..., None, None, :]


class CEELayer(nn.Module):
    """UniFuse CEE fusion of (ERP-branch, cube-branch) features
    (geometry/layers.py:171-198): concat -> 1x1 -> 3x3 residual + SE + 1x1."""

    channels: int
    use_se: bool = True

    @nn.compact
    def __call__(self, equi_feat, c2e_feat):
        x = jnp.concatenate([equi_feat, c2e_feat], axis=-1)
        x = nn.Conv(self.channels, (1, 1), use_bias=False)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        shortcut = nn.GroupNorm(num_groups=8)(
            nn.Conv(self.channels, (3, 3), use_bias=False)(x)
        )
        x = c2e_feat + shortcut
        x = jnp.concatenate([equi_feat, x], axis=-1)
        if self.use_se:
            x = SELayer()(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=False)(x)
        return nn.relu(x)


class ConcatFusion(nn.Module):
    """`Concat` fusion variant (geometry/layers.py:119-130): 1x1 conv over the
    channel-concatenated branches."""

    channels: int

    @nn.compact
    def __call__(self, equi_feat, c2e_feat):
        x = jnp.concatenate([equi_feat, c2e_feat], axis=-1)
        return nn.relu(nn.Conv(self.channels, (1, 1), use_bias=False)(x))


class BiProjFusion(nn.Module):
    """BiFuse-style `BiProj` gated residual fusion (geometry/layers.py:133-150):
    each branch gets a 3x3 conv, a sigmoid mask gates the cube branch, and the
    result is added residually to the ERP branch."""

    channels: int

    @nn.compact
    def __call__(self, equi_feat, c2e_feat):
        e = nn.relu(nn.Conv(self.channels, (3, 3), name="conv_e2c")(equi_feat))
        c = nn.relu(nn.Conv(self.channels, (3, 3), name="conv_c2e")(c2e_feat))
        mask = nn.sigmoid(
            nn.Conv(1, (1, 1), name="conv_mask")(
                jnp.concatenate([e, c], axis=-1)
            )
        )
        return equi_feat + c * mask


FUSION_LAYERS = {"cee": CEELayer, "concat": ConcatFusion, "biproj": BiProjFusion}


def bilinear_resize(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Channels-last bilinear resize of [..., H, W, C]."""
    import jax

    shape = (*x.shape[:-3], new_h, new_w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")
