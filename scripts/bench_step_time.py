"""Minimal flagship train-step timer (resilient to tunnel flakiness).

One AOT compile of the donated jitted step for ONE supervision mode, then
N timed steps with concrete-scalar readbacks; prints per-step times as they
happen so a tunnel death still leaves data.

Usage: SPLAT360_STEP_SUP=erp|cubes python scripts/bench_step_time.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    sup = os.environ.get("SPLAT360_STEP_SUP", "erp")
    n_steps = int(os.environ.get("SPLAT360_STEP_N", "8"))
    h, w = 512, 1024
    root = f"/tmp/t512_scenes_4_{h}"

    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.preprocess import generate_scene
    from splatter360_tpu.train.state import create_train_state, make_train_step

    if not os.path.exists(root):
        generate_scene(root, "train", "t000", n_frames=16,
                       image_shape=(h, w), seed=500)
    cfg = load_config("configs/hm3d.yaml", [
        f"dataset.roots=[{root}]",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.view_sampler.max_distance_between_context_views=5",
        "dataset.view_sampler.min_distance_between_context_views=2",
        "dataset.view_sampler.num_target_views=1",
        f"train.supervision={sup}",
    ])
    dataset = SceneDataset(cfg.dataset, split="train", stage="train", seed=0)
    first = next(batches(dataset, 1))
    first = {k: vv for k, vv in first.items() if k != "scene"}
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, first)
    step_jit = jax.jit(
        make_train_step(cfg.model, cfg.train), donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = step_jit.lower(state, first).compile()
    print(f"compile {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    ma = compiled.memory_analysis()
    times = []
    for i in range(n_steps):
        ts = time.perf_counter()
        state, metrics = compiled(state, first)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - ts)
        print(f"step {i}: {times[-1] * 1e3:.0f} ms", file=sys.stderr,
              flush=True)
    print(json.dumps({
        "metric": "step_time", "supervision": sup,
        "step_ms_median": round(float(np.median(times[1:])) * 1e3, 1),
        "step_ms_all": [round(t * 1e3, 1) for t in times],
        "hbm_minus_donated_gb": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.output_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes) / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
