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
    # [b, n, 6] sym6 (s00,s01,s02,s11,s12,s22 — the model path; a [n, 3, 3]
    # residual pads (3,3)->(4,128) on TPU, 57x HBM) or [b, n, 3, 3] (accepted
    # everywhere for interchange; see geometry/transforms.py cov_as_sym6)
    covariances: jnp.ndarray
    harmonics: jnp.ndarray    # [b, n, 3, d_sh]
    opacities: jnp.ndarray    # [b, n]
