"""Train state + the single jitted train/eval step (SURVEY.md §2.7 parity).

One pure function train_step(state, batch, step) -> (state, metrics) replaces the
reference's ModelWrapperERP.training_step (model_wrapper_erp.py:213-317):
  encoder -> Gaussians -> render target supervision views -> MSE + LPIPS + sin-weighted
  ERP depth L1 -> Adam + OneCycle cosine + grad-clip 0.5 (main.yaml:36-39,73).

Supervision modes:
  * "cubes": render the v*6 target cube faces and supervise against on-device e2c of
    the target panoramas (reference parity; image_cubes_supervise);
  * "erp": render target panoramas directly with the equirect rasterizer and apply a
    sin(phi)-weighted MSE (the TPU-native fast path; not available to the reference).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry.cubemap import erp_to_cube
from ..models.decoder import render_cube_views, render_erp_views
from ..models.encoder import EncoderConfig, EncoderCostVolume360
from .losses import LossConfig, mse_loss, sin_weighted_depth_l1
from .lpips_jax import LPIPS
from .metrics import compute_psnr


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 2e-4
    warm_up_steps: int = 2000
    cosine_lr: bool = True
    max_steps: int = 100_000
    grad_clip: float = 0.5


@dataclass(frozen=True)
class TrainConfig:
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    supervision: str = "cubes"  # "cubes" | "erp"
    cube_face_size: Optional[int] = None  # default: H // 2
    render_backend: str = "pallas"
    max_per_tile: int = 2048  # jax-backend compositor segment cap
    wo_depth_supervise: bool = False
    # lax.map (not vmap) over the v*6 supervision faces: per-face HBM temps
    # are reused across the loop instead of materialized 12x — required to
    # fit the 512x1024 train step in 16 GB (see render_cube_views docstring).
    # "unroll": Python-unrolled faces in one trace — lets XLA interleave
    # stages across faces (lax.map's scan serializes them); more compile
    # time and scheduler-chosen residual liveness.
    sequential_faces: "bool | str" = True
    # replay each face's forward in backward instead of stacking its pallas
    # residuals (render_cube_views docstring); turn off for speed when HBM
    # has headroom
    remat_faces: bool = True
    # band-sharded ERP rendering for validation/eval decodes: when the mesh
    # has >1 device, every chip renders a horizontal pixel band of every view
    # (parallel/render_sharding.py — SURVEY.md §7 M6)
    shard_render: bool = False
    # TRAINING-path face sharding: split each example's v*6 supervision
    # cube-face renders over a (data, face) mesh so global batch < device
    # count no longer idles chips (render_cube_views_face_sharded; gradients
    # proven == unsharded on the virtual mesh). Requires supervision="cubes"
    # and a mesh passed to make_train_step.
    shard_faces: bool = False


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    lpips_params: Any = struct.field(pytree_node=True, default=None)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    apply_fn: Any = struct.field(pytree_node=False, default=None)
    lpips_apply_fn: Any = struct.field(pytree_node=False, default=None)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.cosine_lr:
        # pct_start must span >= 1 whole step: a zero-length warm interval
        # makes optax's boundary division produce NaN lr (and silently NaNs
        # the entire model) on short runs (max_steps < 100 at pct 0.01)
        steps = max(cfg.max_steps, 2)
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=steps, peak_value=cfg.lr,
            pct_start=max(0.01, 1.001 / steps),
        )
    else:
        schedule = optax.linear_schedule(
            init_value=cfg.lr / max(cfg.warm_up_steps, 1) * 0,
            end_value=cfg.lr,
            transition_steps=cfg.warm_up_steps,
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(schedule),
    )


def _mixed_precision_apply(encoder):
    """bf16 network compute over f32 master params (JMP-style policy).

    Params and images are cast to bf16 per apply — every conv/attention
    matmul runs at the MXU's bf16 rate; poses/near/far stay f32 so the
    sweep's warp geometry, the depth/softmax islands (costvolume.py), and
    the adapter math (which receives f32-cast head outputs) keep full
    precision. The cast's autodiff transpose returns f32 gradients, so the
    optimizer state and updates are full precision."""
    def apply(params, image_sphere, image_cubes, extr, near, far, step):
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
        return encoder.apply(
            p16,
            image_sphere.astype(jnp.bfloat16),
            image_cubes.astype(jnp.bfloat16),
            extr, near, far, step,
        )

    return apply


def create_train_state(
    rng: jax.Array,
    encoder_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    example_batch: dict,
) -> TrainState:
    encoder = EncoderCostVolume360(encoder_cfg)
    ctx = example_batch["context"]
    h = ctx["image_sphere"].shape[2]
    face = train_cfg.cube_face_size or h // 2
    cubes = _context_cubes(jnp.asarray(ctx["image_sphere"]), face)
    params = encoder.init(
        rng,
        jnp.asarray(ctx["image_sphere"]),
        cubes,
        jnp.asarray(ctx["extrinsics_sphere"]),
        jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]),
        0,
    )
    lpips = LPIPS()
    lpips_params = None
    if train_cfg.loss.lpips_weight > 0:
        probe = jnp.zeros((1, 64, 64, 3))
        lpips_params = lpips.init(jax.random.PRNGKey(0), probe, probe)
        if train_cfg.loss.lpips_weights:
            from .lpips_jax import load_lpips_torch_weights

            lpips_params = load_lpips_torch_weights(
                lpips_params, train_cfg.loss.lpips_weights
            )
    tx = make_optimizer(train_cfg.optimizer)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        lpips_params=lpips_params,
        tx=tx,
        apply_fn=(
            _mixed_precision_apply(encoder)
            if encoder_cfg.bf16_compute else encoder.apply
        ),
        lpips_apply_fn=lpips.apply,
    )


def _context_cubes(image_sphere: jnp.ndarray, face_w: int) -> jnp.ndarray:
    """On-device e2c of context panoramas [B, V, H, W, 3] -> [B, V, 6, fw, fw, 3]."""
    b, v = image_sphere.shape[0], image_sphere.shape[1]
    flat = image_sphere.reshape((b * v, *image_sphere.shape[2:]))
    faces = jax.vmap(partial(erp_to_cube, face_w=face_w))(flat)
    return faces.reshape(b, v, 6, face_w, face_w, 3)


def compute_losses(
    state: TrainState,
    params,
    batch: dict,
    step: jnp.ndarray,
    encoder_cfg: EncoderConfig,
    train_cfg: TrainConfig,
    mesh=None,
):
    ctx, tgt = batch["context"], batch["target"]
    b, v_t = tgt["image_sphere"].shape[0], tgt["image_sphere"].shape[1]
    h, w = ctx["image_sphere"].shape[2], ctx["image_sphere"].shape[3]
    face = train_cfg.cube_face_size or h // 2

    image_cubes = _context_cubes(ctx["image_sphere"], face)
    gaussians, pred_depth = state.apply_fn(
        params,
        ctx["image_sphere"],
        image_cubes,
        ctx["extrinsics_sphere"],
        ctx["near"],
        ctx["far"],
        step,
    )

    metrics = {}
    lcfg = train_cfg.loss
    if train_cfg.supervision == "cubes":
        use_face_shard = (
            train_cfg.shard_faces
            and mesh is not None
            and mesh.shape.get("face", 1) > 1
        )
        if use_face_shard:
            from ..parallel.render_sharding import (
                render_cube_views_face_sharded,
            )

            rendered = render_cube_views_face_sharded(
                gaussians,
                tgt["extrinsics_sphere"],
                tgt["near"],
                tgt["far"],
                (face, face),
                mesh,
                backend=train_cfg.render_backend,
                max_per_tile=train_cfg.max_per_tile,
            )
        else:
            rendered = render_cube_views(
                gaussians,
                tgt["extrinsics_sphere"],
                tgt["near"],
                tgt["far"],
                (face, face),
                backend=train_cfg.render_backend,
                max_per_tile=train_cfg.max_per_tile,
                sequential=train_cfg.sequential_faces,
                remat_faces=train_cfg.remat_faces,
            )
        gt_faces = _context_cubes(tgt["image_sphere"], face)
        pred = rendered.color  # [B, Vt, 6, f, f, 3]
        loss_mse = mse_loss(pred, gt_faces)
        flat_pred = pred.reshape(-1, face, face, 3)
        flat_gt = gt_faces.reshape(-1, face, face, 3)
        metrics["psnr"] = jnp.mean(compute_psnr(flat_gt, flat_pred))
    else:
        rendered = render_erp_views(
            gaussians,
            tgt["extrinsics_sphere"],
            tgt["near"],
            tgt["far"],
            (h, w),
            backend=train_cfg.render_backend,
            max_per_tile=train_cfg.max_per_tile,
        )
        pred = rendered.color  # [B, Vt, H, W, 3]
        gt = tgt["image_sphere"]
        import math as _math

        rows = jnp.sin(
            (jnp.arange(h, dtype=pred.dtype) + 0.5) * _math.pi / h
        )[None, None, :, None, None]
        loss_mse = jnp.sum(((pred - gt) ** 2) * rows) / (
            jnp.sum(rows) * b * v_t * w * 3
        )
        flat_pred = pred.reshape(-1, h, w, 3)
        flat_gt = gt.reshape(-1, h, w, 3)
        metrics["psnr"] = jnp.mean(compute_psnr(flat_gt, flat_pred))

    total = lcfg.mse_weight * loss_mse
    metrics["loss_mse"] = loss_mse
    # splats silently lost to emission-cap overflow across all rendered views
    # (VERDICT r1 weak #4: a mis-sized cap must be visible, not silent)
    metrics["dropped"] = jnp.sum(rendered.dropped).astype(jnp.float32)

    if lcfg.lpips_weight > 0 and state.lpips_params is not None:
        lp = jnp.mean(
            state.lpips_apply_fn(state.lpips_params, flat_pred, flat_gt)
        )
        lp = jnp.where(step >= lcfg.lpips_apply_after_step, lp, 0.0)
        total = total + lcfg.lpips_weight * lp
        metrics["loss_lpips"] = lp

    if not train_cfg.wo_depth_supervise and lcfg.depth_weight > 0:
        ld = sin_weighted_depth_l1(
            pred_depth, ctx["depth_sphere"], ctx["far"]
        )
        total = total + lcfg.depth_weight * ld
        metrics["loss_depth"] = ld

    metrics["loss"] = total
    return total, metrics


def make_train_step(encoder_cfg: EncoderConfig, train_cfg: TrainConfig,
                    mesh=None):
    """mesh: required (with a `face` axis) for train_cfg.shard_faces; the
    DP-only step needs none."""
    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            return compute_losses(
                state, params, batch, state.step, encoder_cfg, train_cfg,
                mesh=mesh,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(encoder_cfg: EncoderConfig, train_cfg: TrainConfig):
    def eval_step(state: TrainState, batch: dict):
        _, metrics = compute_losses(
            state, state.params, batch, state.step, encoder_cfg, train_cfg
        )
        return metrics

    return eval_step
