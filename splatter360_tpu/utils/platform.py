"""Honor JAX_PLATFORMS despite the ambient TPU plugin.

The environment's sitecustomize registers the TPU PJRT plugin at interpreter
start and forces the platform before user code runs, so the JAX_PLATFORMS env
var alone is ignored. Calling this before any device use re-pins the platform
from the env var (jax.config.update works as long as no backend has been
touched — keep module scope free of jnp values; see ops/tiling.py::_SENTINEL).
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
