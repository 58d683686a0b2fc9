"""Train-step MFU + encoder/decoder breakdown -> TRAINBENCH.json (VERDICT r2 #2).

Measures, at the hm3d production scale (512x1024 ERP, 2 context views,
batch 1, bf16 network compute) on the real chip:

  step_ms       full jitted train step (encoder fwd+bwd, renderer fwd+bwd,
                losses, Adam) — the number that sets chip-days per run
  encoder_ms    encoder forward alone (images -> Gaussians)
  decoder_ms    v*6 cube-face supervision render forward alone
  encoder_fb_ms / decoder_fb_ms   fwd+bwd per phase (grad wrt params /
                gaussians) — the step split the reference times per phase
                (model_wrapper_erp.py:326-345 encoder/decoder benchmarker)
  flops         XLA compiled cost analysis of the full step
  mfu_bf16      flops / step_time / 197e12 (v5e bf16 MXU peak)
  hbm_peak_gb   device peak_bytes_in_use after the timed steps

MFU convention: cost_analysis flops count each lowered op once regardless of
dtype; the bf16 peak is the honest denominator for a bf16_compute step. The
rasterizer's work is mostly VPU (transcendentals) + small-K matmuls, so LOW
train-step MFU is structural for this workload class, not a tuning failure —
the roofline section in BASELINE.md quantifies the renderer separately.

Usage: python scripts/bench_train_mfu.py   (JAX_PLATFORMS=axon ambient)
"""

import json
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _make_batch  # noqa: E402
from splatter360_tpu.config import load_config  # noqa: E402
from splatter360_tpu.models.decoder import render_cube_views  # noqa: E402
from splatter360_tpu.train.state import (  # noqa: E402
    _context_cubes, create_train_state, make_train_step,
)

V5E_BF16_PEAK = 197e12


def timed(fn, *args, iters=5, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    cfg = load_config("configs/hm3d.yaml", sys.argv[1:])
    h, w = cfg.dataset.image_shape
    face = h // 2
    print(f"devices: {jax.devices()} image {h}x{w}", file=sys.stderr)

    batch = _make_batch(1, 2, h, w)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, batch)

    # full step + cost analysis
    step = jax.jit(make_train_step(cfg.model, cfg.train))
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))

    t0 = time.perf_counter()
    new_state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"first step {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", file=sys.stderr)
    step_ms, _ = timed(lambda: step(state, batch), iters=5)

    # encoder forward
    ctx = jax.tree_util.tree_map(jnp.asarray, batch["context"])
    cubes = _context_cubes(ctx["image_sphere"], face)
    enc_fwd = jax.jit(lambda p: state.apply_fn(
        p, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
        ctx["near"], ctx["far"], 0))
    encoder_ms, (gaussians, _) = timed(lambda: enc_fwd(state.params))

    # encoder fwd+bwd (cotangent on the gaussian fields)
    def enc_loss(p):
        g, d = state.apply_fn(
            p, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
            ctx["near"], ctx["far"], 0)
        return (jnp.sum(g.means * 1e-6) + jnp.sum(g.covariances * 1e-6)
                + jnp.sum(g.harmonics * 1e-6) + jnp.sum(g.opacities * 1e-6)
                + jnp.sum(d * 1e-6))

    enc_fb = jax.jit(jax.grad(enc_loss))
    encoder_fb_ms, _ = timed(lambda: enc_fb(state.params))

    # decoder forward + fwd/bwd on fixed gaussians (v*6 faces, production path)
    tgt = jax.tree_util.tree_map(jnp.asarray, batch["target"])

    def dec_fwd(g):
        return render_cube_views(
            g, tgt["extrinsics_sphere"], tgt["near"], tgt["far"],
            (face, face), backend=cfg.train.render_backend,
            max_per_tile=cfg.train.max_per_tile,
            sequential=cfg.train.sequential_faces,
            remat_faces=cfg.train.remat_faces,
        ).color

    jd = jax.jit(dec_fwd)
    decoder_ms, _ = timed(lambda: jd(gaussians))
    jdg = jax.jit(jax.grad(lambda g: jnp.mean(dec_fwd(g) ** 2)))
    decoder_fb_ms, _ = timed(lambda: jdg(gaussians))

    stats = jax.local_devices()[0].memory_stats() or {}
    out = {
        "image": [h, w],
        "step_ms": round(step_ms, 1),
        "encoder_ms": round(encoder_ms, 1),
        "encoder_fb_ms": round(encoder_fb_ms, 1),
        "decoder_ms": round(decoder_ms, 1),
        "decoder_fb_ms": round(decoder_fb_ms, 1),
        "flops_per_step": flops,
        "mfu_bf16": round(flops / (step_ms / 1e3) / V5E_BF16_PEAK, 4),
        "hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
        "loss": float(metrics["loss"]),
    }
    with open("TRAINBENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
