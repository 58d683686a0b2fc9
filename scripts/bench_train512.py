"""Flagship-scale training anchor -> TRAIN512.json (VERDICT r3 next #6).

Nothing had trained the 512x1024 recipe past smoke (REFPIPE is 64x128/50
steps; OVERFIT is 128x256). This runs the real `configs/hm3d.yaml` recipe
(512x1024 ERP, 2 ctx views, bf16_compute, MSE + LPIPS + sin-weighted depth)
on >= 4 procedural scenes for a few thousand steps on the chip and records:

  * the train-loss + held-out-pair PSNR curve (healthy descent = the
    full-scale recipe TRAINS, not just steps),
  * compiler HBM program footprint of the jitted step,
  * a mid-run checkpoint save + RESTORE-and-continue check (orbax resume at
    full scale, reference protocol /root/reference/src/main.py:172-200).

Usage:
  python scripts/bench_train512.py                 # TPU, 512x1024
  SPLAT360_T512_STEPS=N     override step count (default 1500)
  SPLAT360_T512_SCENES=K    override train-scene count (default 4)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


OUT = "TRAIN512.json"


def flush(art):
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)


def main():
    steps = int(os.environ.get("SPLAT360_T512_STEPS", "1500"))
    k_train = int(os.environ.get("SPLAT360_T512_SCENES", "4"))
    # shape override is for CPU smoke-testing this script only
    h, w = (int(x) for x in
            os.environ.get("SPLAT360_T512_SHAPE", "512,1024").split(","))
    root = f"/tmp/t512_scenes_{k_train}_{h}"

    from splatter360_tpu.preprocess import generate_scene

    t0 = time.perf_counter()
    if not os.path.exists(root):
        for i in range(k_train):
            generate_scene(root, "train", f"t{i:03d}", n_frames=16,
                           image_shape=(h, w), seed=500 + i)
        # TWO never-trained eval scenes (VERDICT r4 weak #4: one pair on one
        # scene is indistinguishable from eval noise at flagship cost)
        generate_scene(root, "test", "v000", n_frames=16,
                       image_shape=(h, w), seed=990)
        generate_scene(root, "test", "v001", n_frames=16,
                       image_shape=(h, w), seed=991)
        print(f"generated {k_train}+2 scenes in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import (
        SceneDataset, batch_examples, batches,
    )
    from splatter360_tpu.models.decoder import render_erp_views
    from splatter360_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )
    from splatter360_tpu.train.metrics import compute_psnr
    from splatter360_tpu.train.state import (
        _context_cubes, create_train_state, make_train_step,
    )

    cfg = load_config("configs/hm3d.yaml", [
        f"dataset.roots=[{root}]",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.view_sampler.max_distance_between_context_views=5",
        "dataset.view_sampler.min_distance_between_context_views=2",
        "dataset.view_sampler.num_target_views=1",
        f"train.optimizer.max_steps={steps}",
        "train.optimizer.warm_up_steps=100",
    ] + ([f"train.render_backend={os.environ['SPLAT360_T512_BACKEND']}"]
         if "SPLAT360_T512_BACKEND" in os.environ else []))
    print(f"devices: {jax.devices()} {h}x{w} steps={steps}",
          file=sys.stderr, flush=True)

    # fixed held-out feed-forward eval pairs: 2 never-trained scenes x 2
    # target draws each = 4 pairs (test stage pins context, draws targets)
    eval_pairs = []
    seen = set()
    for seed in (1, 2, 3, 4):
        for ex in SceneDataset(cfg.dataset, split="test", stage="test",
                               seed=seed):
            key = (ex["scene"], tuple(ex["target"]["index"].tolist()))
            if key in seen:
                continue
            seen.add(key)
            b = batch_examples([ex])
            eval_pairs.append((
                jax.tree_util.tree_map(jnp.asarray, b["context"]),
                jax.tree_util.tree_map(jnp.asarray, b["target"]),
                key,
            ))
        if len(eval_pairs) >= 4:
            break
    eval_pairs = eval_pairs[:4]
    print(f"eval pairs: {[k for _, _, k in eval_pairs]}",
          file=sys.stderr, flush=True)

    dataset = SceneDataset(cfg.dataset, split="train", stage="train", seed=0)
    batch_iter = batches(dataset, 1)
    first = next(batch_iter)
    first = {k: v for k, v in first.items() if k != "scene"}

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, first)
    step_jit = jax.jit(
        make_train_step(cfg.model, cfg.train), donate_argnums=(0,))
    # AOT-compile once and call the executable directly (a later jit call
    # would trace+compile a second time; the step is ~4 min to compile)
    compiled = step_jit.lower(state, first).compile()
    step_fn = compiled
    try:
        ma = compiled.memory_analysis()
        hbm_gb = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                  + ma.output_size_in_bytes
                  + ma.generated_code_size_in_bytes) / 2**30
    except Exception:
        hbm_gb = 0.0

    @jax.jit
    def heldout_psnr_pair(params, ectx, etgt):
        cubes = _context_cubes(ectx["image_sphere"], h // 2)
        gaussians, _ = state.apply_fn(
            params, ectx["image_sphere"], cubes, ectx["extrinsics_sphere"],
            ectx["near"], ectx["far"], 10**9,
        )
        out = render_erp_views(
            gaussians, etgt["extrinsics_sphere"], etgt["near"], etgt["far"],
            (h, w), backend=cfg.train.render_backend,
            max_per_tile=cfg.train.max_per_tile,
        )
        flat_p = out.color.reshape(-1, h, w, 3)
        flat_g = etgt["image_sphere"].reshape(-1, h, w, 3)
        return jnp.mean(compute_psnr(flat_g, flat_p))

    def heldout_psnr(params):
        per_pair = [float(heldout_psnr_pair(params, ectx, etgt))
                    for ectx, etgt, _ in eval_pairs]
        return float(np.mean(per_pair)), per_pair

    # fresh dir every run: a stale checkpoint from a previous invocation
    # would get silently restored instead of the one saved at ckpt_step
    ckpt_dir = "/tmp/t512_ckpt"
    if os.path.exists(ckpt_dir):
        import shutil

        shutil.rmtree(ckpt_dir)
    ckpt_step = max(steps // 2, 1)
    art = {
        "image_shape": [h, w],
        "k_train_scenes": k_train,
        "steps": steps,
        "hbm_program_gb": round(hbm_gb, 2),
        "curve": [],
        "resume_check": None,
        "eval_pairs": [list(map(str, k)) for _, _, k in eval_pairs],
        "note": (
            "full configs/hm3d.yaml recipe at flagship scale on procedural "
            "scenes; heldout_psnr is FEED-FORWARD averaged over 4 fixed "
            "pairs on 2 never-trained scenes. Mid-run orbax save -> restore "
            "-> continue verifies checkpoint/resume at full scale ON CHIP."
        ),
    }
    eval_every = max(steps // 10, 50)
    t0 = time.perf_counter()
    batch = first
    step_times = []
    while int(state.step) < steps:
        ts = time.perf_counter()
        state, metrics = step_fn(state, batch)
        s = int(state.step)  # device sync (concrete readback)
        step_times.append(time.perf_counter() - ts)
        if s % eval_every == 0 or s == 1 or s >= steps:
            p, per_pair = heldout_psnr(state.params)
            art["curve"].append({
                "step": s, "loss": round(float(metrics["loss"]), 5),
                "heldout_psnr": round(p, 3),
                "heldout_psnr_pairs": [round(x, 3) for x in per_pair],
                "wall_s": round(time.perf_counter() - t0, 1),
            })
            print(f"[t512] step {s}: loss={float(metrics['loss']):.5f} "
                  f"heldout_psnr={p:.3f}", file=sys.stderr, flush=True)
            flush(art)
        if s == ckpt_step:
            # full-scale orbax round trip: save, restore into a FRESH state
            # skeleton, verify step + param identity, continue from restored
            save_checkpoint(ckpt_dir, s, state)
            fresh = create_train_state(
                jax.random.PRNGKey(1), cfg.model, cfg.train, first)
            restored, did_restore = restore_checkpoint(ckpt_dir, fresh)
            assert did_restore
            same_step = int(restored.step) == s
            pdiff = max(
                float(jnp.max(jnp.abs(a - b))) for a, b in zip(
                    jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params))
            )
            art["resume_check"] = {
                "saved_at_step": s, "restored_step_ok": same_step,
                "max_param_abs_diff": pdiff,
            }
            assert same_step and pdiff == 0.0, art["resume_check"]
            # Continue from the RESTORED arrays. Graft them into the original
            # state's aux metadata: the AOT executable's input pytree is keyed
            # on function identity (tx/apply_fn), and `fresh` carries new
            # function objects — state=restored would raise a pytree-mismatch
            # TypeError on the next compiled() call. lpips_params are frozen
            # (not in the checkpoint), so the original ones stay.
            state = state.replace(
                params=restored.params,
                opt_state=restored.opt_state,
                step=restored.step,
            )
            print(f"[t512] checkpoint/resume ok at step {s}",
                  file=sys.stderr, flush=True)
            flush(art)
        nxt = next(batch_iter)
        batch = {k: v for k, v in nxt.items() if k != "scene"}

    st = np.array(step_times[2:])
    art["step_ms_median"] = round(float(np.median(st)) * 1e3, 1)
    art["wall_s_total"] = round(time.perf_counter() - t0, 1)
    flush(art)
    print(json.dumps({
        "metric": "train512",
        "final_loss": art["curve"][-1]["loss"],
        "final_heldout_psnr": art["curve"][-1]["heldout_psnr"],
        "step_ms_median": art["step_ms_median"],
        "hbm_program_gb": art["hbm_program_gb"],
    }))


if __name__ == "__main__":
    main()
