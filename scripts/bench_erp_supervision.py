"""ERP-direct supervision as the TPU-first training fast path -> ERPSUP.json
(VERDICT r4 #4; SURVEY.md §7 design stance "make ERP-direct the fast path").

The reference can only supervise on v*6 pinhole cube faces because its CUDA
rasterizer is pinhole-only (model_wrapper_erp.py:213-317,
decoder_splatting_cuda.py:44-59). This framework's rasterizer projects
directly to equirect, so training can render v target PANORAMAS instead of
v*6 faces — replacing the 12 sequential 256x256 face renders (1350 of the
2379 ms flagship step) with 1-2 ERP renders through the 11 Mpx/s path.

Two measurements:
  A. QUALITY, matched steps at 128x256 (the GENERALIZE proxy config, depth
     supervision ON = recipe): supervision="cubes" vs supervision="erp",
     identical data/seeds/steps. Held-out feed-forward eval reports BOTH
     erp-PSNR and cube-face-PSNR for each run so neither mode is scored by
     its own training objective.
  B. FLAGSHIP STEP TIME at 512x1024: compile + time the jitted train step
     under both supervision modes (same batch), report ms/step and the
     compiler memory accounting.

Usage:
  python scripts/bench_erp_supervision.py            # TPU: A then B
  SPLAT360_ERPSUP_PART=quality|flagship              # run one part
  SPLAT360_ERPSUP_SMALL=1                            # CPU smoke
  SPLAT360_ERPSUP_STEPS=N
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
import numpy as np  # noqa: E402

OUT = os.environ.get("SPLAT360_ERPSUP_OUT", "ERPSUP.json")


def _load_art():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def _flush(art):
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)


def quality_run(cfg, steps, eval_batches, h, w, label):
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.models.decoder import (
        render_cube_views, render_erp_views,
    )
    from splatter360_tpu.train.metrics import compute_psnr, compute_ssim
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

    @jax.jit
    def heldout(params, ctx, tgt):
        cubes = _context_cubes(ctx["image_sphere"], h // 2)
        gaussians, pred_depth = state.apply_fn(
            params, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
            ctx["near"], ctx["far"], 10**9,
        )
        # (a) ERP novel view
        out_e = render_erp_views(
            gaussians, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (h, w), backend=cfg.train.render_backend,
        )
        fp = out_e.color.reshape(-1, h, w, 3)
        fg = tgt["image_sphere"].reshape(-1, h, w, 3)
        # (b) cube faces of the same targets (the reference's eval surface)
        face = h // 2
        out_c = render_cube_views(
            gaussians, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (face, face), backend=cfg.train.render_backend,
            sequential=True, remat_faces=False,
        )
        gt_faces = _context_cubes(tgt["image_sphere"], face)
        fpc = out_c.color.reshape(-1, face, face, 3)
        fgc = gt_faces.reshape(-1, face, face, 3)
        # depth (geometry check)
        gt_d = ctx["depth_sphere"]
        mask = gt_d > 0.1
        abs_rel = jnp.sum(
            jnp.where(mask,
                      jnp.abs(pred_depth - gt_d) / jnp.maximum(gt_d, 0.1),
                      0.0)
        ) / jnp.maximum(jnp.sum(mask), 1)
        return (jnp.mean(compute_psnr(fg, fp)),
                jnp.mean(compute_ssim(fg, fp)),
                jnp.mean(compute_psnr(fgc, fpc)),
                abs_rel)

    def eval_all(params):
        acc = [[], [], [], []]
        for ctx, tgt in eval_batches:
            for i, vv in enumerate(heldout(params, ctx, tgt)):
                acc[i].append(float(vv))
        return [round(sum(xs) / len(xs), 4) for xs in acc]

    curve = []
    eval_every = max(steps // 8, 25)
    t0 = time.perf_counter()
    batch = first
    while int(state.step) < steps:
        state, metrics = step_fn(state, batch)
        s = int(state.step)
        if s % eval_every == 0 or s == 1 or s >= steps:
            pe, se, pc, dr = eval_all(state.params)
            curve.append({
                "step": s, "heldout_psnr_erp": pe, "heldout_ssim_erp": se,
                "heldout_psnr_cubes": pc, "heldout_depth_abs_rel": dr,
                "loss": round(float(metrics["loss"]), 5),
            })
            print(f"[{label}] step {s}: erp={pe:.3f} cubes={pc:.3f} "
                  f"abs_rel={dr:.4f} loss={float(metrics['loss']):.4f}",
                  file=sys.stderr, flush=True)
        nxt = next(batch_iter)
        batch = {k: vv for k, vv in nxt.items() if k != "scene"}
    return {
        "label": label,
        "final": curve[-1],
        "seconds": round(time.perf_counter() - t0, 1),
        "curve": curve,
    }


def run_quality(small, steps):
    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batch_examples
    from splatter360_tpu.preprocess import generate_scene

    h, w = (64, 128) if small else (128, 256)
    k_train = 2 if small else 10
    k_test = 1 if small else 2
    root = f"/tmp/gen_scenes_{h}x{w}_{k_train}"  # bench_generalize cache
    if not os.path.exists(root):
        for i in range(k_train):
            generate_scene(root, "train", f"g{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=200 + i)
        for i in range(k_test):
            generate_scene(root, "test", f"h{i:03d}", n_frames=24,
                           image_shape=(h, w), seed=900 + i)

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

    art = _load_art()
    art.setdefault("quality", {})
    art["quality"]["image_shape"] = [h, w]
    art["quality"]["steps"] = steps
    runs = art["quality"].setdefault("runs", [])
    for sup in ("cubes", "erp"):
        cfg = load_config(
            "configs/hm3d.yaml", overrides + [f"train.supervision={sup}"])
        runs[:] = [r for r in runs if r["label"] != f"sup_{sup}"]
        runs.append(quality_run(
            cfg, steps, eval_batches, h, w, f"sup_{sup}"))
        _flush(art)
    return art


def run_flagship(small):
    """Step-time at the flagship recipe under both supervision modes."""
    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.preprocess import generate_scene
    from splatter360_tpu.train.state import create_train_state, make_train_step

    h, w = (64, 128) if small else (512, 1024)
    root = f"/tmp/t512_scenes_4_{h}" if not small else "/tmp/erpsup_small"
    if not os.path.exists(root):
        generate_scene(root, "train", "t000", n_frames=16,
                       image_shape=(h, w), seed=500)

    art = _load_art()
    art.setdefault("flagship", {})["image_shape"] = [h, w]
    for sup in ("erp", "cubes"):
        cfg = load_config("configs/hm3d.yaml", [
            f"dataset.roots=[{root}]",
            f"dataset.image_shape=[{h},{w}]",
            "dataset.view_sampler.max_distance_between_context_views=5",
            "dataset.view_sampler.min_distance_between_context_views=2",
            "dataset.view_sampler.num_target_views=1",
            f"train.supervision={sup}",
        ] + (["train.render_backend=jax",
              "model.d_feature=32", "model.num_depth_candidates=16",
              "model.costvolume_unet_feat_dim=32",
              "model.costvolume_unet_channel_mult=[1,1]",
              "model.costvolume_unet_attn_res=[2]",
              "model.depth_unet_feat_dim=8", "model.depth_unet_attn_res=[8]",
              "model.depth_unet_channel_mult=[1,1,1]",
              "model.gaussian_adapter.sh_degree=1"] if small else []))
        dataset = SceneDataset(cfg.dataset, split="train", stage="train",
                               seed=0)
        first = next(batches(dataset, 1))
        first = {k: vv for k, vv in first.items() if k != "scene"}
        state = create_train_state(
            jax.random.PRNGKey(0), cfg.model, cfg.train, first)
        step_jit = jax.jit(
            make_train_step(cfg.model, cfg.train), donate_argnums=(0,))
        t0 = time.perf_counter()
        compiled = step_jit.lower(state, first).compile()
        compile_s = time.perf_counter() - t0
        try:
            ma = compiled.memory_analysis()
            hbm_gb = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                      + ma.output_size_in_bytes
                      + ma.generated_code_size_in_bytes) / 2**30
            hbm_gb_nodonate = hbm_gb - ma.alias_size_in_bytes / 2**30
        except Exception:
            hbm_gb = hbm_gb_nodonate = 0.0
        times = []
        n_steps = 3 if small else 6
        for i in range(n_steps):
            ts = time.perf_counter()
            state, metrics = compiled(state, first)
            _ = float(metrics["loss"])  # concrete readback = device sync
            times.append(time.perf_counter() - ts)
        med = float(np.median(times[1:]))
        art["flagship"][f"sup_{sup}"] = {
            "step_ms": round(med * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "hbm_program_gb": round(hbm_gb, 2),
            "hbm_minus_donated_gb": round(hbm_gb_nodonate, 2),
            "loss_finite": bool(np.isfinite(float(metrics["loss"]))),
        }
        print(f"[flagship sup={sup}] step_ms={med * 1e3:.1f} "
              f"hbm={hbm_gb:.2f}G (minus donated {hbm_gb_nodonate:.2f}G)",
              file=sys.stderr, flush=True)
        _flush(art)
        del state, compiled, step_jit
    return art


def main():
    small = os.environ.get("SPLAT360_ERPSUP_SMALL") == "1"
    steps = int(os.environ.get("SPLAT360_ERPSUP_STEPS",
                               "20" if small else "1500"))
    part = os.environ.get("SPLAT360_ERPSUP_PART", "both")
    if part in ("quality", "both"):
        run_quality(small, steps)
    if part in ("flagship", "both"):
        run_flagship(small)
    art = _load_art()
    print(json.dumps({"metric": "erp_supervision",
                      "flagship": art.get("flagship"),
                      "quality_final": {
                          r["label"]: r["final"]
                          for r in art.get("quality", {}).get("runs", [])
                      }}))


if __name__ == "__main__":
    main()
