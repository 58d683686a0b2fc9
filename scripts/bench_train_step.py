"""Full train-step throughput at the hm3d production scale (real TPU).

Times the jitted train step (encoder + pallas renderer + losses + Adam) on a
synthetic batch at 512x1024 ERP, 2 context views — the number that bounds
end-to-end training time (the reference trains 100k steps on 8x V100;
SURVEY.md §6). Prints steps/s and a per-step ms figure.

Usage: python scripts/bench_train_step.py  (JAX_PLATFORMS=axon ambient)
Optional: SPLAT360_BENCH_STEP_SMALL=1 for a 128x256 CPU smoke.
"""

import os
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _make_batch  # noqa: E402
from splatter360_tpu.config import load_config  # noqa: E402
from splatter360_tpu.train.state import (  # noqa: E402
    create_train_state, make_train_step,
)


def main():
    small = os.environ.get("SPLAT360_BENCH_STEP_SMALL") == "1"
    overrides = []
    if small:
        overrides = [
            "dataset.image_shape=[128,256]", "model.d_feature=32",
            "model.num_depth_candidates=16", "model.costvolume_unet_feat_dim=32",
            "model.costvolume_unet_channel_mult=[1,1]",
            "model.costvolume_unet_attn_res=[2]", "model.depth_unet_feat_dim=8",
            "model.depth_unet_attn_res=[8]",
            "model.depth_unet_channel_mult=[1,1,1]",
            "model.gaussian_adapter.sh_degree=1",
            # pallas_call has no CPU lowering outside interpret mode
            "train.render_backend=jax",
        ]
    cfg = load_config("configs/hm3d.yaml", overrides)
    h, w = cfg.dataset.image_shape
    print(f"devices: {jax.devices()}  image {h}x{w} "
          f"backend={cfg.train.render_backend}", file=sys.stderr)

    batch = _make_batch(1, 2, h, w)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, batch)
    step = jax.jit(make_train_step(cfg.model, cfg.train), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", file=sys.stderr)

    iters = 3 if small else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train_step: {dt * 1e3:.1f} ms/step  ({1.0 / dt:.2f} steps/s)  "
          f"loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
