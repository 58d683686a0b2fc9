"""Spherical epipolar cross-attention (the reference's `use_epipolar_trans`
ablation — src/model/encoder/epipolar/epipolar_sampler.py:31-167 and the
epipolar mode of src/model/encoder/backbone/multiview_transformer.py — rebuilt
for ERP geometry).

On a sphere the epipolar "line" of an ERP pixel is the great-circle image of
its ray in the other view; sampling that curve is exactly the spherical sweep
at a ladder of candidate radii (the same machinery the cost volume uses, see
costvolume.spherical_sweep_warp). Each pixel's feature cross-attends over the
D samples gathered from every other view — single-head scaled-dot-product with
a learned depth positional encoding, residual + layernorm. Static shapes, one
gather per (view pair); vmapped over batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.transforms import inverse_se3
from .costvolume import depth_candidates, spherical_sweep_warp


class EpipolarCrossAttention(nn.Module):
    d_model: int = 128
    num_samples: int = 32
    depth_sampling_type: str = "log_depth"

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,    # [B, V, h, w, C]
        extrinsics: jnp.ndarray,  # [B, V, 4, 4] c2w
        near: jnp.ndarray,        # [B, V]
        far: jnp.ndarray,         # [B, V]
    ) -> jnp.ndarray:
        b, v, h, w, c = features.shape
        d = self.num_samples
        cand = depth_candidates(near, far, d, self.depth_sampling_type)

        q_proj = nn.Dense(self.d_model, name="q")
        k_proj = nn.Dense(self.d_model, name="k")
        v_proj = nn.Dense(self.d_model, name="v")
        out_proj = nn.Dense(c, name="out")
        # learned positional encoding over the depth-sample index
        depth_pe = self.param(
            "depth_pe", nn.initializers.normal(0.02), (d, self.d_model)
        )

        w2c = inverse_se3(extrinsics)

        def per_batch(feats_b, extr_b, w2c_b, cand_b):
            outs = []
            for ref in range(v):
                gathered = []
                for other in range(v):
                    if other == ref:
                        continue
                    rel = w2c_b[other] @ extr_b[ref]
                    warped = spherical_sweep_warp(
                        feats_b[other], rel, cand_b[ref]
                    )  # [D, h, w, C]
                    gathered.append(warped)
                kv = jnp.concatenate(gathered, axis=0)  # [(V-1)*D, h, w, C]
                kv = kv.transpose(1, 2, 0, 3)           # [h, w, S, C]
                q = q_proj(feats_b[ref])                # [h, w, dm]
                k = k_proj(kv) + jnp.tile(depth_pe, (v - 1, 1))[None, None]
                val = v_proj(kv)
                attn = jnp.einsum("hwc,hwsc->hws", q, k) / (self.d_model**0.5)
                attn = jax.nn.softmax(attn, axis=-1)
                agg = jnp.einsum("hws,hwsc->hwc", attn, val)
                outs.append(feats_b[ref] + out_proj(agg))  # residual
            return jnp.stack(outs, axis=0)

        out = jax.vmap(per_batch)(features, extrinsics, w2c, cand)
        return nn.LayerNorm(name="norm")(out)
