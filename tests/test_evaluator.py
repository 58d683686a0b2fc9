"""Eval-protocol semantics tests (train/evaluator.py).

The heavyweight end-to-end evaluator drive lives in the verify recipe
(mode=test); these tests pin protocol *semantics* that are cheap to check in
isolation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.ops.rasterizer import render_tiled

H, W = 32, 64


def _render(opacity_boost):
    g = random_gaussians(jax.random.PRNGKey(3), 1500, sh_degree=1,
                         scale_range=(0.08, 0.3))
    op = jnp.clip(g["opacities"] * opacity_boost, 0.0, 0.99)
    return render_tiled(
        g["means"], g["covariances"], g["harmonics"], op, jnp.eye(4),
        (H, W), camera_kind="erp", backend="jax", max_per_tile=256,
        render_depth=True,
    )


def test_depth_alpha_norm_negligible_at_full_alpha():
    """test.depth_alpha_norm semantics: the reference protocol scores the raw
    composited z (no alpha division, cuda_splatting.py:226-269); the
    normalized variant divides by alpha. Wherever alpha saturates the two are
    identical to ~alpha tolerance, so defaulting to the reference convention
    does not change saturated-scene metrics."""
    out = _render(opacity_boost=25.0)  # dense, near-opaque scene
    alpha = np.asarray(out.alpha)
    raw = np.asarray(out.depth)
    norm = raw / np.maximum(alpha, 1e-6)
    sat = alpha > 0.995
    assert sat.mean() > 0.5, "scene not saturated enough to exercise the claim"
    np.testing.assert_allclose(raw[sat], norm[sat], rtol=6e-3)

    # And where alpha is NOT saturated the conventions genuinely differ —
    # the flag is semantic, not cosmetic.
    thin = _render(opacity_boost=0.15)
    a2 = np.asarray(thin.alpha)
    r2 = np.asarray(thin.depth)
    n2 = r2 / np.maximum(a2, 1e-6)
    lo = (a2 > 0.05) & (a2 < 0.6)
    assert lo.sum() > 50
    rel = np.abs(r2[lo] - n2[lo]) / np.maximum(n2[lo], 1e-6)
    assert np.median(rel) > 0.3
