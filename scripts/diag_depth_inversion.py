"""Root-cause the wide-baseline depth inversion -> DIAG_DEPTH.json (VERDICT r4 #3).

GENERALIZE.json r4: at 2.3x-wide baselines with photometric-only training,
the FULL model's held-out depth abs_rel ends 2.4x WORSE than its own
wo_cost_volume ablation (0.60 vs 0.25). This harness separates the
hypotheses by instrumenting the depth path (costvolume.py sow taps):

  * coarse_abs_rel — the cost-volume softmax-expectation depth alone
    (upsampled x8, no refine). coarse GOOD + fine BAD => the depth-refine
    head is destroying a good stereo estimate (defect in the residual
    path without depth supervision). coarse BAD => the cost volume itself
    never localizes under photometric-only training.
  * pdf_entropy — saturation (entropy -> 0 early) freezes the expectation
    gradient d(coarse)/d(logits) ~ pdf spread: overconfident-wrong becomes
    untrainable without direct depth supervision.
  * delta_disp_absmean vs fullres_disp_absmean — how much the refine head
    overrides the cost volume (|delta| ~ |disp| means the refine head IS
    the depth estimate and the cost volume is ignored).

Variants: full + wo_cost_volume (both wide, depth_weight=0), matching the
GENERALIZE r4 inversion pair exactly (min=8, max=14 context gaps).

Usage:
  python scripts/diag_depth_inversion.py            # TPU, 128x256, 1500 steps
  SPLAT360_DIAG_SMALL=1 ...                         # CPU smoke
  SPLAT360_DIAG_STEPS=N / SPLAT360_DIAG_VARIANTS=full,wo_cost_volume
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.environ.get("SPLAT360_DIAG_OUT", "DIAG_DEPTH.json")


def _find_taps(inter):
    """Flatten the sowed intermediates into {name: value} (last sow wins)."""
    out = {}

    def walk(node):
        for k, val in node.items():
            if isinstance(val, dict):
                walk(val)
            else:
                out[k] = val[-1] if isinstance(val, (tuple, list)) else val

    walk(inter)
    return out


def run_variant(cfg, steps, eval_batches, h, w, label):
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.models.decoder import render_erp_views
    from splatter360_tpu.models.encoder import EncoderCostVolume360
    from splatter360_tpu.models.layers import bilinear_resize
    from splatter360_tpu.train.metrics import compute_psnr
    from splatter360_tpu.train.state import (
        _context_cubes, create_train_state, make_train_step,
    )

    dataset = SceneDataset(cfg.dataset, split="train", stage="train", seed=0)
    batch_iter = batches(dataset, 1)
    first = next(batch_iter)
    first = {k: vv for k, vv in first.items() if k != "scene"}

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, first)
    step_fn = jax.jit(
        make_train_step(cfg.model, cfg.train), donate_argnums=(0,))

    enc = EncoderCostVolume360(cfg.model)

    @jax.jit
    def diag_metrics(params, ctx, tgt):
        cubes = _context_cubes(ctx["image_sphere"], h // 2)
        p, im, cb = params, ctx["image_sphere"], cubes
        if cfg.model.bf16_compute:
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)
            im = im.astype(jnp.bfloat16)
            cb = cb.astype(jnp.bfloat16)
        (gaussians, depth_map), mods = enc.apply(
            p, im, cb, ctx["extrinsics_sphere"], ctx["near"], ctx["far"],
            10**9, mutable=["intermediates"],
        )
        taps = _find_taps(mods["intermediates"])

        gt_d = ctx["depth_sphere"]  # [B, V, H, W]
        mask = gt_d > 0.1

        def abs_rel(pred):
            return jnp.sum(
                jnp.where(mask, jnp.abs(pred - gt_d) / jnp.maximum(gt_d, 0.1),
                          0.0)
            ) / jnp.maximum(jnp.sum(mask), 1)

        coarse = taps["coarse_depth"]  # [B*? v, fh, fw] f32
        bv = coarse.shape[0] * coarse.shape[1]
        coarse_full = bilinear_resize(
            coarse.reshape(bv, coarse.shape[2], coarse.shape[3], 1), h, w
        ).reshape(gt_d.shape)

        out = render_erp_views(
            gaussians, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (h, w), backend=cfg.train.render_backend,
        )
        flat_p = out.color.reshape(-1, h, w, 3)
        flat_g = tgt["image_sphere"].reshape(-1, h, w, 3)
        return {
            "fine_abs_rel": abs_rel(depth_map),
            "coarse_abs_rel": abs_rel(coarse_full),
            "pdf_entropy": taps["pdf_entropy"],
            "delta_disp_absmean": taps.get(
                "delta_disp_absmean", jnp.float32(0)),
            "fullres_disp_absmean": taps.get(
                "fullres_disp_absmean", jnp.float32(0)),
            "psnr": jnp.mean(compute_psnr(flat_g, flat_p)),
        }

    def eval_heldout(params):
        acc = {}
        for ctx, tgt in eval_batches:
            m = diag_metrics(params, ctx, tgt)
            for k, vv in m.items():
                acc.setdefault(k, []).append(float(vv))
        return {k: round(sum(vs) / len(vs), 4) for k, vs in acc.items()}

    curve = []
    eval_every = max(steps // 8, 25)
    t0 = time.perf_counter()
    batch = first
    while int(state.step) < steps:
        state, metrics = step_fn(state, batch)
        s = int(state.step)
        if s % eval_every == 0 or s == 1 or s >= steps:
            m = eval_heldout(state.params)
            m["step"] = s
            m["loss"] = round(float(metrics["loss"]), 5)
            curve.append(m)
            print(f"[{label}] step {s}: " + " ".join(
                f"{k}={vv}" for k, vv in m.items() if k != "step"),
                file=sys.stderr, flush=True)
        nxt = next(batch_iter)
        batch = {k: vv for k, vv in nxt.items() if k != "scene"}
    return {
        "label": label,
        "final": curve[-1],
        "seconds": round(time.perf_counter() - t0, 1),
        "curve": curve,
    }


def main():
    small = os.environ.get("SPLAT360_DIAG_SMALL") == "1"
    steps = int(os.environ.get("SPLAT360_DIAG_STEPS",
                               "30" if small else "1500"))
    variants = os.environ.get(
        "SPLAT360_DIAG_VARIANTS", "full,wo_cost_volume").split(",")
    h, w = (64, 128) if small else (128, 256)
    k_train = 2 if small else 10
    k_test = 1 if small else 2
    # SPLAT360_DIAG_PANELS > 0 switches to STEREO-HARD worlds: floating
    # textured panels whose depth appearance cannot predict (scene_builder
    # n_panels docstring) + wider room-scale jitter — the benchmark where a
    # working cost volume CAN win (VERDICT r4 next #3, second half).
    n_panels = int(os.environ.get("SPLAT360_DIAG_PANELS", "0"))
    tag = f"_p{n_panels}" if n_panels else ""
    # same scene pool as bench_generalize (reuses its cache dir) when flat
    root = f"/tmp/gen_scenes_{h}x{w}_{k_train}{tag}"

    from splatter360_tpu.preprocess import generate_scene

    panel_kw = (
        {"n_panels": n_panels, "scale_jitter": 1.25} if n_panels else {}
    )
    if not os.path.exists(root):
        for i in range(k_train):
            generate_scene(root, "train", f"g{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=200 + i, **panel_kw)
        for i in range(k_test):
            generate_scene(root, "test", f"h{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=900 + i, **panel_kw)

    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batch_examples

    # the exact GENERALIZE r4 wide-nodepthsup recipe
    overrides = [
        f"dataset.roots=[{root}]",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.view_sampler.max_distance_between_context_views=14",
        "dataset.view_sampler.min_distance_between_context_views=8",
        "dataset.view_sampler.num_target_views=2",
        f"train.optimizer.max_steps={steps}",
        "train.optimizer.warm_up_steps=150",
        "train.optimizer.lr=3e-4",
        "train.loss.depth_weight=0",
    ]
    if small:
        overrides += [
            "model.d_feature=32", "model.num_depth_candidates=16",
            "model.costvolume_unet_feat_dim=32",
            "model.costvolume_unet_channel_mult=[1,1]",
            "model.costvolume_unet_attn_res=[2]",
            "model.depth_unet_feat_dim=8", "model.depth_unet_attn_res=[8]",
            "model.depth_unet_channel_mult=[1,1,1]",
            "model.gaussian_adapter.sh_degree=1",
            "train.render_backend=jax",
        ]
    else:
        overrides += [
            "model.d_feature=64", "model.num_depth_candidates=48",
            "model.costvolume_unet_feat_dim=64",
            "model.gaussian_adapter.sh_degree=2",
        ]
    overrides += sys.argv[1:]

    VARIANT_OVERRIDES = {
        "full": [],
        "wo_cost_volume": ["model.wo_cost_volume=true"],
        # true monocular control: no stereo anywhere (cost volume, backbone
        # cross-view attn, U-Net cross-view attn all off)
        "mono": ["model.wo_cost_volume=true",
                 "model.wo_backbone_cross_attn=true",
                 "model.use_cross_view_self_attn=false"],
        # refine head off: coarse cost-volume depth feeds the adapter directly
        "full_worefine": ["model.wo_depth_refine=true"],
    }

    cfg0 = load_config("configs/hm3d.yaml", overrides)
    eval_ds = SceneDataset(cfg0.dataset, split="test", stage="test", seed=1)
    eval_batches = []
    for ex in eval_ds:
        b = batch_examples([ex])
        ctx = jax.tree_util.tree_map(jnp.asarray, b["context"])
        tgt = jax.tree_util.tree_map(jnp.asarray, b["target"])
        eval_batches.append((ctx, tgt))
        if len(eval_batches) >= (1 if small else 4):
            break

    runs = []

    def flush():
        with open(OUT, "w") as f:
            json.dump({
                "image_shape": [h, w], "steps": steps,
                "recipe": "wide (gap 8-14) + depth_weight=0 — the exact "
                          "GENERALIZE r4 inversion setting",
                "runs": runs,
            }, f, indent=1)

    for name in variants:
        cfg = load_config(
            "configs/hm3d.yaml", overrides + VARIANT_OVERRIDES[name])
        runs.append(run_variant(cfg, steps, eval_batches, h, w, name))
        flush()
    print(json.dumps({
        "metric": "diag_depth",
        **{r["label"]: {k: r["final"][k] for k in
                        ("fine_abs_rel", "coarse_abs_rel", "pdf_entropy")}
           for r in runs},
    }))


if __name__ == "__main__":
    main()
