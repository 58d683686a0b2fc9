"""Shared model data contracts.

Gaussians mirrors the reference's flattened per-scene Gaussian set
(/root/reference/src/model/types.py and encoder_costvolume.py:490-507):
means [b, N, 3], covariances [b, N, 3, 3], harmonics [b, N, 3, d_sh], opacities [b, N]
with N = v * H * W (one Gaussian per context-view ERP pixel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Gaussians(NamedTuple):
    means: jnp.ndarray        # [b, n, 3]
    covariances: jnp.ndarray  # [b, n, 3, 3]
    harmonics: jnp.ndarray    # [b, n, 3, d_sh]
    opacities: jnp.ndarray    # [b, n]
