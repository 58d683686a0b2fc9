"""Cross-scene generalization benchmark -> GENERALIZE.json (VERDICT r2 #3).

The system's headline capability is FEED-FORWARD novel-view synthesis
(reference encoder_costvolume.py:254-508 — no per-scene optimization), but
the only committed quality artifact so far is a one-scene overfit
(OVERFIT.json). This harness proves generalization:

  * trains the full model on K procedural scenes (preprocess/ worlds),
  * evaluates PSNR/SSIM on HELD-OUT scenes the model has never seen,
    feed-forward (one encoder pass, no finetuning),
  * runs a matched `wo_cost_volume` ablation at equal steps — held-out PSNR
    demonstrably above the ablation shows the cost volume is doing the
    geometric work, not the CNN prior alone.

Usage:
  python scripts/bench_generalize.py                   # TPU, 128x256
  SPLAT360_GEN_SMALL=1 python scripts/bench_generalize.py   # CPU smoke
  SPLAT360_GEN_STEPS=N / SPLAT360_GEN_ABLATE=0 to override
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


def run_training(cfg, steps, train_root, eval_batches, h, w, label):
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.models.decoder import render_erp_views
    from splatter360_tpu.train.metrics import compute_psnr, compute_ssim
    from splatter360_tpu.train.state import (
        _context_cubes, create_train_state, make_train_step,
    )

    dataset = SceneDataset(cfg.dataset, split="train", stage="train", seed=0)
    batch_iter = batches(dataset, 1)
    first = next(batch_iter)
    first = {k: v for k, v in first.items() if k != "scene"}

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, first)
    step_fn = jax.jit(
        make_train_step(cfg.model, cfg.train), donate_argnums=(0,))

    @jax.jit
    def heldout_metrics(params, ctx, tgt):
        cubes = _context_cubes(ctx["image_sphere"], h // 2)
        gaussians, pred_depth = state.apply_fn(
            params, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
            ctx["near"], ctx["far"], 10**9,
        )
        out = render_erp_views(
            gaussians, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (h, w), backend=cfg.train.render_backend,
        )
        flat_p = out.color.reshape(-1, h, w, 3)
        flat_g = tgt["image_sphere"].reshape(-1, h, w, 3)
        # encoder-predicted context depth vs GT: the GEOMETRY metric.
        # Novel-view PSNR can stay high with wrong geometry at narrow
        # baselines; depth_abs_rel on never-seen scenes is what separates
        # stereo (cost volume) from a monocular prior.
        gt_d = ctx["depth_sphere"]
        mask = gt_d > 0.1
        abs_rel = jnp.sum(
            jnp.where(mask, jnp.abs(pred_depth - gt_d) / jnp.maximum(
                gt_d, 0.1), 0.0)
        ) / jnp.maximum(jnp.sum(mask), 1)
        return (jnp.mean(compute_psnr(flat_g, flat_p)),
                jnp.mean(compute_ssim(flat_g, flat_p)), abs_rel)

    def eval_heldout(params):
        ps, ss, ds = [], [], []
        for ctx, tgt in eval_batches:
            p, s, dr = heldout_metrics(params, ctx, tgt)
            ps.append(float(p))
            ss.append(float(s))
            ds.append(float(dr))
        return (sum(ps) / len(ps), sum(ss) / len(ss),
                sum(ds) / len(ds))

    curve = []
    eval_every = max(steps // 12, 25)
    t0 = time.perf_counter()
    batch = first
    while int(state.step) < steps:
        state, metrics = step_fn(state, batch)
        s = int(state.step)
        if s % eval_every == 0 or s == 1 or s >= steps:
            p, ss, dr = eval_heldout(state.params)
            curve.append({"step": s, "heldout_psnr": round(p, 3),
                          "heldout_ssim": round(ss, 4),
                          "heldout_depth_abs_rel": round(dr, 4),
                          "loss": round(float(metrics["loss"]), 5)})
            print(f"[{label}] step {s}: heldout_psnr={p:.3f} "
                  f"ssim={ss:.4f} depth_abs_rel={dr:.4f} "
                  f"loss={float(metrics['loss']):.4f}",
                  file=sys.stderr, flush=True)
        nxt = next(batch_iter)
        batch = {k: v for k, v in nxt.items() if k != "scene"}
    return {
        "label": label,
        "final_heldout_psnr": curve[-1]["heldout_psnr"],
        "final_heldout_ssim": curve[-1]["heldout_ssim"],
        "final_heldout_depth_abs_rel": curve[-1]["heldout_depth_abs_rel"],
        "seconds": round(time.perf_counter() - t0, 1),
        "curve": curve,
    }


def main():
    small = os.environ.get("SPLAT360_GEN_SMALL") == "1"
    steps = int(os.environ.get("SPLAT360_GEN_STEPS",
                               "40" if small else "3000"))
    do_ablate = os.environ.get("SPLAT360_GEN_ABLATE", "1") == "1"
    # extra config overrides from argv (e.g. train.loss.depth_weight=0 to
    # isolate the cost volume's geometric contribution when GT ERP-depth
    # supervision would otherwise teach the mono head the geometry), label
    # tag, and output path override for side-by-side variants
    extra_overrides = sys.argv[1:]
    tag = os.environ.get("SPLAT360_GEN_TAG", "")
    out_override = os.environ.get("SPLAT360_GEN_OUT")
    h, w = (64, 128) if small else (128, 256)
    k_train = 2 if small else 10
    k_test = 1 if small else 2
    root = f"/tmp/gen_scenes_{h}x{w}_{k_train}"

    from splatter360_tpu.preprocess import generate_scene

    if not os.path.exists(root):
        for i in range(k_train):
            generate_scene(root, "train", f"g{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=200 + i)
        for i in range(k_test):
            generate_scene(root, "test", f"h{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=900 + i)
        print(f"generated {k_train} train + {k_test} held-out scenes",
              file=sys.stderr)

    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batch_examples

    overrides = [
        f"dataset.roots=[{root}]",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.view_sampler.max_distance_between_context_views=6",
        "dataset.view_sampler.min_distance_between_context_views=3",
        "dataset.view_sampler.num_target_views=2",
        f"train.optimizer.max_steps={steps}",
        "train.optimizer.warm_up_steps=150",
        "train.optimizer.lr=3e-4",
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
    overrides += extra_overrides
    cfg = load_config("configs/hm3d.yaml", overrides)
    print(f"devices: {jax.devices()} {h}x{w} steps={steps} "
          f"K={k_train}+{k_test}", file=sys.stderr)

    # fixed feed-forward eval pairs from the HELD-OUT scenes (frame-40-style
    # deterministic test contexts)
    eval_ds = SceneDataset(cfg.dataset, split="test", stage="test", seed=1)
    eval_batches = []
    for ex in eval_ds:
        b = batch_examples([ex])
        ctx = jax.tree_util.tree_map(jnp.asarray, b["context"])
        tgt = jax.tree_util.tree_map(jnp.asarray, b["target"])
        eval_batches.append((ctx, tgt))
        if len(eval_batches) >= (1 if small else 4):
            break

    out_path = "GENERALIZE.json" if not small else "/tmp/generalize_small.json"
    if out_override:
        out_path = out_override
    runs = []

    def flush():
        # incremental write: a crash in a later run must not lose the
        # completed ones
        art = {
            "image_shape": [h, w],
            "k_train_scenes": k_train,
            "k_heldout_scenes": k_test,
            "steps": steps,
            "small": small,
            "runs": runs,
            "note": (
                "feed-forward evaluation on scenes never seen in training; "
                "full model vs wo_cost_volume at equal steps isolates the "
                "cost-volume's contribution (VERDICT r2 missing #2)"
            ),
        }
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)

    runs.append(run_training(
        cfg, steps, root, eval_batches, h, w, "full" + tag))
    flush()
    if do_ablate:
        cfg_ab = load_config(
            "configs/hm3d.yaml", overrides + ["model.wo_cost_volume=true"])
        runs.append(run_training(
            cfg_ab, steps, root, eval_batches, h, w, "wo_cost_volume" + tag))
        flush()
    summary = {r["label"]: r["final_heldout_psnr"] for r in runs}
    print(json.dumps({"metric": "heldout_psnr", **summary, "steps": steps}))


if __name__ == "__main__":
    main()
