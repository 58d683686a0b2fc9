"""Scaling proxies on the virtual CPU mesh -> SCALING.json (VERDICT r2 #4a).

Real multi-chip hardware is unavailable here (one v5e chip via a tunnel), so
this measures the quantities that DETERMINE scaling efficiency and records
them next to the correctness proofs (tests/test_render_sharding.py,
__graft_entry__.dryrun_multichip):

  band_sharding   render_erp_sharded's work split: per-band (per-device)
                  instance counts at the north-star geometry, the all-gather
                  payload per step, and the resulting imbalance factor
                  (efficiency ceiling = mean/max band work, since the slowest
                  band gates the step).
  face_sharding   render_cube_views_face_sharded's split: per-face live
                  instance counts grouped per device -> imbalance.
  dp              data axis is balanced by construction (equal examples per
                  device); recorded for completeness with the psum payload
                  (gradient bytes) per step.

Run on the 8-device CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/measure_scaling.py
"""

import json
import sys

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()  # JAX_PLATFORMS=cpu must beat the axon sitecustomize

import jax
import jax.numpy as jnp
import numpy as np

from splatter360_tpu.data.synthetic import random_gaussians
from splatter360_tpu.geometry.cubemap import cube_face_extrinsics
from splatter360_tpu.ops.projection import project_erp, project_pinhole
from splatter360_tpu.ops.tiling import TILE_H, assign_tiles
from splatter360_tpu.geometry.cubemap import cube_face_intrinsics

# Scaled-down north-star geometry (CPU-friendly): the ratios (instances per
# band, straddle fractions) are what transfer, not absolute counts.
H, W = 128, 256
N = 2 * H * W
SH_DEG = 2
N_DEV = 8


def band_sharding_stats(h=None, w=None):
    """Per-device instance counts for render_erp_sharded's band split.

    r3 measured UNIFORM contiguous bands at max/mean 1.52 (ceiling 0.66) —
    the per-band profile tracks cos(latitude) almost exactly. r4 ships
    area-weighted bands (_band_partition): unequal tile-row counts chosen so
    every band covers equal solid angle. Both splits are reported; the
    shipped one is `area_weighted`. Measured at the north-star 512-row
    geometry — at 128 rows there are only 8 tile rows for 8 devices, so ANY
    contiguous partition is forced to one row per device."""
    from splatter360_tpu.parallel.render_sharding import _band_partition

    from splatter360_tpu.ops.tiling import TILE_W

    h = h or H
    w = w or W
    n = 2 * h * w
    g = random_gaussians(jax.random.PRNGKey(0), n, sh_degree=SH_DEG)
    c2w = jnp.eye(4)
    proj = jax.jit(
        lambda m, c, o: project_erp(m, c, c2w, (h, w), 0.1, opacities=o)
    )(g["means"], g["covariances"], g["opacities"])

    u = np.asarray(proj.mean2d[:, 0])
    v = np.asarray(proj.mean2d[:, 1])
    rx = np.asarray(proj.radius[:, 0])
    ry = np.asarray(proj.radius[:, 1])
    valid = np.asarray(proj.valid)
    # per-splat x-tile multiplicity (wrap cap): per-band cost = EMITTED
    # instances (splat x covered-tile pairs — what the sort and the kernel
    # segment walk actually process), additive over tile rows
    ntx = -(-w // TILE_W)
    xmul = np.minimum(
        np.floor((u + rx) / TILE_W) - np.floor((u - rx) / TILE_W) + 1, ntx
    )

    def band_counts(y0s, bhs):
        counts = []
        for y0, bh in zip(y0s, bhs):
            tot = 0.0
            for ry0 in range(int(y0), int(y0 + bh), TILE_H):
                in_row = (
                    valid & (v - ry0 + ry >= 0.0) & (v - ry0 - ry < TILE_H)
                )
                tot += float((xmul * in_row).sum())
            counts.append(int(tot))
        return np.array(counts)

    n_rows = -(-h // TILE_H)
    h_pad = -(-h // (TILE_H * N_DEV)) * (TILE_H * N_DEV)
    uni_h = h_pad // N_DEV
    uniform = band_counts(
        [b * uni_h for b in range(N_DEV)], [uni_h] * N_DEV)
    starts, rows = _band_partition(n_rows, N_DEV, h)
    weighted = band_counts(
        [s * TILE_H for s in starts], [r * TILE_H for r in rows])

    # all_gather payload: packed 2D params [N, 13] f32; each device sends its
    # shard to every other -> (n-1)/n * N * 13 * 4 bytes received per device.
    payload = int(n * 13 * 4)
    N_, SH_DEG_ = n, SH_DEG  # for the note below
    return {
        "n_gaussians": n,
        "n_devices": N_DEV,
        "geometry": f"{h}x{w} ERP",
        "uniform_bands": {
            "per_band_emitted_instances": uniform.tolist(),
            "imbalance_max_over_mean": round(
                float(uniform.max() / uniform.mean()), 4),
            "efficiency_ceiling_mean_over_max": round(
                float(uniform.mean() / uniform.max()), 4),
        },
        "area_weighted_bands": {
            "tile_row_starts": list(starts),
            "tile_rows_per_band": list(rows),
            "per_band_emitted_instances": weighted.tolist(),
            "imbalance_max_over_mean": round(
                float(weighted.max() / weighted.mean()), 4),
            "efficiency_ceiling_mean_over_max": round(
                float(weighted.mean() / weighted.max()), 4),
        },
        "shipped": "area_weighted_bands",
        "per_band_emitted_instances": weighted.tolist(),
        "imbalance_max_over_mean": round(
            float(weighted.max() / weighted.mean()), 4),
        "efficiency_ceiling_mean_over_max": round(
            float(weighted.mean() / weighted.max()), 4
        ),
        "all_gather_bytes_per_view": payload,
        "all_gather_bytes_received_per_device": int(
            payload * (N_DEV - 1) / N_DEV
        ),
        "note": (
            "slowest band gates the step; ceiling = mean/max band work. "
            "3D-gaussian equivalent payload would be "
            f"{int(N_ * (3 + 6 + 3 * (SH_DEG_ + 1) ** 2 + 1) * 4)} B "
            "(the 2D pack is the ICI saver)"
        ),
    }


def face_sharding_stats():
    g = random_gaussians(jax.random.PRNGKey(1), N, sh_degree=SH_DEG)
    extr = jnp.eye(4)[None, None]  # [1, 1, 4, 4]
    faces_c2w = cube_face_extrinsics(extr)[0, 0]  # [6, 4, 4]
    intr = cube_face_intrinsics(jnp.float32)
    face = H // 2

    per_face = []
    for f in range(6):
        proj = jax.jit(
            lambda m, c, o, cc: project_pinhole(
                m, c, cc, intr, (face, face), 0.1, opacities=o
            )
        )(g["means"], g["covariances"], g["opacities"], faces_c2w[f])
        a = jax.jit(
            lambda p: assign_tiles(p, (face, face), False)
        )(proj)
        k_real = int(np.sum(np.asarray(a.tile_counts)))
        per_face.append(k_real)
    per_face = np.array(per_face)

    # v=2 target views -> 12 faces; on a face axis of 4 each device renders 3
    # (lax.map); device work = sum of its faces' instances.
    v_t = 2
    faces_12 = np.concatenate([per_face, per_face])
    n_face_axis = 4
    dev_work = faces_12.reshape(n_face_axis, -1).sum(axis=1)
    return {
        "per_face_instances": per_face.tolist(),
        "face_axis": n_face_axis,
        "per_device_instances_v2": dev_work.tolist(),
        "imbalance_max_over_mean": round(
            float(dev_work.max() / dev_work.mean()), 4
        ),
        "efficiency_ceiling_mean_over_max": round(
            float(dev_work.mean() / dev_work.max()), 4
        ),
    }


def dp_stats():
    # gradient psum payload = parameter bytes (f32 grads) per step
    import __graft_entry__ as ge
    from splatter360_tpu.train.losses import LossConfig
    from splatter360_tpu.train.state import (
        OptimizerConfig, TrainConfig, create_train_state,
    )

    h, w, v = 64, 128, 2
    batch = ge._make_batch(1, v, h, w)
    cfg = ge._tiny_encoder_cfg()
    tcfg = TrainConfig(optimizer=OptimizerConfig(max_steps=10),
                       loss=LossConfig(), supervision="cubes",
                       render_backend="jax", max_per_tile=256)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    return {
        "examples_per_device": "global_batch / n_devices (exact by construction)",
        "grad_psum_bytes_per_step_tiny_model": int(n_params * 4),
        "note": (
            "flagship-model psum payload scales with params; DP efficiency "
            "is gated by psum/step-time ratio, not by imbalance"
        ),
    }


def main():
    out = {
        "mesh": f"{N_DEV}-device virtual CPU mesh (xla_force_host_platform)",
        "geometry": f"band: 512x1024 ERP (north-star rows); face: {H}x{W}, "
                    f"N={N}, sh_degree={SH_DEG}",
        "band_sharding": band_sharding_stats(512, 1024),
        "face_sharding": face_sharding_stats(),
        "dp": dp_stats(),
    }
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
