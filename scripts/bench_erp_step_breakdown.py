"""Why is the erp-supervised flagship step 2404 ms? Stage-by-stage probe.

Times (concrete-readback, per-dispatch — fine at the 100ms+ scale):
  encoder_fwd          encoder apply only
  encoder_fb           encoder fwd + bwd (dummy scalar loss)
  render_fb            ERP render fwd+bwd given FIXED gaussians (bench path)
  loss_fwd             full erp-supervision loss forward
  loss_fb              value_and_grad of the full loss
  loss_fb_nolpips      ... with lpips_weight=0
  loss_fb_nodepth      ... with depth_weight=0
  loss_fb_mseonly      ... mse only
"""

import json
import sys
import time

sys.path.insert(0, ".")

from splatter360_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def t_call(fn, *args, iters=4):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import dataclasses
    import os

    from splatter360_tpu.config import load_config
    from splatter360_tpu.data.dataset import SceneDataset, batches
    from splatter360_tpu.preprocess import generate_scene
    from splatter360_tpu.train.state import (
        _context_cubes, compute_losses, create_train_state,
    )

    h, w = 512, 1024
    root = f"/tmp/t512_scenes_4_{h}"
    if not os.path.exists(root):
        generate_scene(root, "train", "t000", n_frames=16,
                       image_shape=(h, w), seed=500)
    cfg = load_config("configs/hm3d.yaml", [
        f"dataset.roots=[{root}]",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.view_sampler.max_distance_between_context_views=5",
        "dataset.view_sampler.min_distance_between_context_views=2",
        "dataset.view_sampler.num_target_views=1",
        "train.supervision=erp",
    ])
    dataset = SceneDataset(cfg.dataset, split="train", stage="train", seed=0)
    first = next(batches(dataset, 1))
    first = {k: vv for k, vv in first.items() if k != "scene"}
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.train, first)
    batch = jax.tree_util.tree_map(jnp.asarray, first)
    ctx = batch["context"]

    res = {}

    # encoder alone
    @jax.jit
    def enc_fwd(params):
        cubes = _context_cubes(ctx["image_sphere"], h // 2)
        g, d = state.apply_fn(
            params, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
            ctx["near"], ctx["far"], 0)
        return jnp.sum(d) + jnp.sum(g.means)

    @jax.jit
    def enc_fb(params):
        return jax.grad(
            lambda p: enc_fwd.__wrapped__(p) if hasattr(enc_fwd, "__wrapped__")
            else 0.0
        )(params)

    # redefine cleanly (jit of grad of the unjitted fn)
    def _enc_scalar(params):
        cubes = _context_cubes(ctx["image_sphere"], h // 2)
        g, d = state.apply_fn(
            params, ctx["image_sphere"], cubes, ctx["extrinsics_sphere"],
            ctx["near"], ctx["far"], 0)
        return (jnp.sum(d) + jnp.sum(g.means) + jnp.sum(g.covariances)
                + jnp.sum(g.harmonics) + jnp.sum(g.opacities))

    enc_fb = jax.jit(jax.grad(_enc_scalar))
    res["encoder_fwd_ms"] = round(t_call(enc_fwd, state.params), 1)
    print("encoder_fwd", res["encoder_fwd_ms"], file=sys.stderr, flush=True)
    res["encoder_fb_ms"] = round(t_call(enc_fb, state.params), 1)
    print("encoder_fb", res["encoder_fb_ms"], file=sys.stderr, flush=True)

    # loss variants
    def make_loss_fb(tcfg):
        def lf(params):
            return compute_losses(
                state, params, batch, state.step, cfg.model, tcfg)[0]
        return jax.jit(jax.grad(lf))

    def make_loss_fwd(tcfg):
        def lf(params):
            return compute_losses(
                state, params, batch, state.step, cfg.model, tcfg)[0]
        return jax.jit(lf)

    tc = cfg.train
    lc = tc.loss
    variants = {
        "loss_fwd": (make_loss_fwd(tc),),
        "loss_fb": (make_loss_fb(tc),),
        "loss_fb_nolpips": (make_loss_fb(dataclasses.replace(
            tc, loss=dataclasses.replace(lc, lpips_weight=0.0))),),
        "loss_fb_nodepth": (make_loss_fb(dataclasses.replace(
            tc, loss=dataclasses.replace(lc, depth_weight=0.0))),),
        "loss_fb_mseonly": (make_loss_fb(dataclasses.replace(
            tc, loss=dataclasses.replace(
                lc, lpips_weight=0.0, depth_weight=0.0))),),
    }
    for name, (fn,) in variants.items():
        res[name + "_ms"] = round(t_call(fn, state.params), 1)
        print(name, res[name + "_ms"], file=sys.stderr, flush=True)

    print(json.dumps({"metric": "erp_step_breakdown", **res}))


if __name__ == "__main__":
    main()
