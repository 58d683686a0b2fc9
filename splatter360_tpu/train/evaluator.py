"""Test/eval harness (SURVEY.md §2.7 test_step/on_test_end parity).

Per scene: timed encoder + decoder, PSNR/SSIM/LPIPS over rendered target views,
masked depth metrics (top cube face excluded in cube mode, mask depth > 0.1 m),
image artifacts, stitched ERP output, optional interpolated-trajectory video; then
scores_all_avg.json + per-metric score json + benchmark.json + peak_memory.json
(model_wrapper_erp.py:319-586).
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SceneDataset, batch_examples
from ..geometry.cubemap import erp_to_cube
from ..geometry.transforms import interpolate_pose_6d
from ..models.decoder import render_cube_views, render_erp_views
from ..train.state import _context_cubes
from ..utils.benchmarker import Benchmarker
from ..utils.image_io import (
    apply_depth_colormap, hcat, save_image, save_video,
)
from .metrics import compute_depth_metrics, compute_psnr, compute_ssim


class Evaluator:
    def __init__(self, cfg, state, lpips_fn=None):
        self.cfg = cfg
        self.state = state
        self.lpips_fn = lpips_fn
        self.benchmarker = Benchmarker()
        self.out = Path(cfg.test.output_path)
        self.out.mkdir(parents=True, exist_ok=True)

        enc_cfg = cfg.model

        @jax.jit
        def encode(params, image_sphere, image_cubes, extr, near, far):
            return state.apply_fn(
                params, image_sphere, image_cubes, extr, near, far, 10**9
            )

        self._encode = encode
        h = cfg.dataset.image_shape[0]
        self.face = h // 2

        if getattr(cfg.train, "shard_render", False) and jax.device_count() > 1:
            # band-sharded ERP decode: all chips cooperate on every view
            # (parallel/render_sharding.py; train.shard_render)
            from ..parallel.mesh import create_mesh
            from ..parallel.render_sharding import render_erp_views_sharded

            mesh = create_mesh()
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())

            @partial(jax.jit, static_argnums=(4,),
                     in_shardings=(rep, rep, rep, rep))
            def _decode_erp_sharded(gaussians, extr, near, far, render_depth):
                return render_erp_views_sharded(
                    gaussians, extr, near, far,
                    tuple(cfg.dataset.image_shape), mesh,
                    render_depth=render_depth,
                    backend=cfg.train.render_backend,
                )

            def decode_erp(gaussians, extr, near, far, render_depth=False):
                return _decode_erp_sharded(
                    gaussians, extr, near, far, render_depth
                )
        else:
            @partial(jax.jit, static_argnames=("render_depth",))
            def decode_erp(gaussians, extr, near, far, render_depth=False):
                return render_erp_views(
                    gaussians, extr, near, far, tuple(cfg.dataset.image_shape),
                    render_depth=render_depth, backend=cfg.train.render_backend,
                )

        self._decode_erp = decode_erp

        @partial(jax.jit, static_argnames=("render_depth",))
        def decode_cubes(gaussians, extr, near, far, render_depth=False):
            return render_cube_views(
                gaussians, extr, near, far, (self.face, self.face),
                backend=cfg.train.render_backend, render_depth=render_depth,
            )

        self._decode_cubes = decode_cubes

    def run(self, split: str = "test"):
        cfg = self.cfg
        dataset = SceneDataset(cfg.dataset, split=split, stage="test")
        scores: dict = {}
        n_steps = 0
        for ex in dataset:
            scene = ex["scene"]
            batch = batch_examples([ex])
            ctx = jax.tree_util.tree_map(
                jnp.asarray, {k: v for k, v in batch["context"].items()}
            )
            tgt = jax.tree_util.tree_map(
                jnp.asarray, {k: v for k, v in batch["target"].items()}
            )
            cubes = _context_cubes(ctx["image_sphere"], self.face)

            with self.benchmarker.time("encoder"):
                gaussians, pred_depth = self._encode(
                    self.state.params, ctx["image_sphere"], cubes,
                    ctx["extrinsics_sphere"], ctx["near"], ctx["far"],
                )
                jax.block_until_ready(gaussians.means)

            v_t = tgt["image_sphere"].shape[1]
            with self.benchmarker.time("decoder", num_calls=v_t):
                out = self._decode_erp(
                    gaussians, tgt["extrinsics_sphere"], tgt["near"],
                    tgt["far"], render_depth=cfg.test.eval_depth,
                )
                jax.block_until_ready(out.color)
            if out.dropped is not None:
                n_drop = int(np.sum(np.asarray(out.dropped)))
                if n_drop > 0:
                    print(
                        f"warning: {scene}: {n_drop} splats dropped by "
                        f"emission-cap overflow — rendered images are degraded"
                    )

            faces = None
            if cfg.test.eval_on_cubes:
                # Reference protocol (model_wrapper_erp.py:471-541): metrics on
                # the v*6 rendered cube faces, not the stitched/direct ERP.
                faces = self._decode_cubes(
                    gaussians, tgt["extrinsics_sphere"], tgt["near"],
                    tgt["far"], render_depth=cfg.test.eval_depth,
                )
                f = self.face
                pred = np.asarray(faces.color[0]).reshape(-1, f, f, 3)
                gt = np.asarray(
                    _context_cubes(tgt["image_sphere"], f)[0]
                ).reshape(-1, f, f, 3)
            else:
                pred = np.asarray(out.color[0])       # [Vt, H, W, 3]
                gt = np.asarray(tgt["image_sphere"][0])
            psnr = np.asarray(compute_psnr(jnp.asarray(gt), jnp.asarray(pred)))
            ssim = np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pred)))
            entry = {
                "psnr": float(psnr.mean()),
                "ssim": float(ssim.mean()),
                "mse": float(np.mean((pred - gt) ** 2)),
            }
            if self.lpips_fn is not None:
                entry["lpips"] = float(
                    np.mean(np.asarray(self.lpips_fn(pred, gt)))
                )
            if cfg.test.eval_depth and faces is not None:
                # Reference cube-depth protocol (model_wrapper_erp.py:500-541):
                # z-depth metrics over the rendered cube faces, TOP FACE (U,
                # FRBLUD index 4) excluded, mask GT depth > 0.1 m. GT z-depths
                # come from e2c of the ERP distance map with the distance->z
                # cosine factor (Equirec2Cube.cosmaps parity).
                f = self.face
                # Default: UNNORMALIZED composited z, exactly the reference's
                # depth render (z composited as a color, no alpha division —
                # cuda_splatting.py:226-269). test.depth_alpha_norm divides by
                # alpha for the unbiased estimate; identical where alpha ~= 1.
                pr_d = np.asarray(faces.depth[0])
                if cfg.test.depth_alpha_norm:
                    pr_d = pr_d / np.maximum(np.asarray(faces.alpha[0]), 1e-6)
                pr_d = pr_d.astype(np.float32)  # [Vt, 6, f, f] pinhole camera-z
                gt_d = np.asarray(
                    jax.vmap(
                        lambda d: erp_to_cube(d, f, depth_to_z=True)
                    )(tgt["depth_sphere"][0][..., None])[..., 0]
                )  # [Vt, 6, f, f]
                keep = [0, 1, 2, 3, 5]  # FRBL D — top (U) excluded
                pr_d, gt_d = pr_d[:, keep], gt_d[:, keep]
                mask = gt_d > 0.1
                dm = compute_depth_metrics(
                    jnp.asarray(gt_d), jnp.asarray(pr_d), jnp.asarray(mask)
                )
                entry.update({f"depth_{k}": float(v) for k, v in dm.items()})
            elif cfg.test.eval_depth and out.depth is not None:
                gt_d = np.asarray(tgt["depth_sphere"][0])
                pr_d = np.asarray(out.depth[0])
                if cfg.test.depth_alpha_norm:
                    pr_d = pr_d / np.maximum(np.asarray(out.alpha[0]), 1e-6)
                mask = gt_d > 0.1
                dm = compute_depth_metrics(
                    jnp.asarray(gt_d), jnp.asarray(pr_d), jnp.asarray(mask)
                )
                entry.update({f"depth_{k}": float(v) for k, v in dm.items()})
            scores[scene] = entry

            if cfg.test.save_image:
                for vi in range(pred.shape[0]):
                    save_image(
                        pred[vi], self.out / scene / f"color/{vi:04d}.png"
                    )
                    save_image(
                        gt[vi], self.out / scene / f"gt/{vi:04d}.png"
                    )
                    # per-view error map (reference test_step parity:
                    # model_wrapper_erp.py saves err_* images per face)
                    err_img = np.abs(pred[vi] - gt[vi]).mean(axis=-1)
                    save_image(
                        apply_depth_colormap(err_img, near=0.0, far=0.5),
                        self.out / scene / f"err/{vi:04d}.png",
                    )
                save_image(
                    hcat(pred[0], gt[0]),
                    self.out / scene / "compare.png",
                )
                if cfg.test.eval_depth and out.depth is not None:
                    d = np.asarray(out.depth[0]) / np.maximum(
                        np.asarray(out.alpha[0]), 1e-6
                    )
                    for vi in range(d.shape[0]):
                        save_image(
                            apply_depth_colormap(d[vi]),
                            self.out / scene / f"depth/{vi:04d}.png",
                        )
            if cfg.test.save_video:
                try:
                    traj = getattr(cfg.test, "video_trajectory", "interpolate")
                    self.render_video(
                        gaussians, ctx["extrinsics_sphere"][0],
                        float(tgt["near"][0, 0]), float(tgt["far"][0, 0]),
                        self.out / scene / f"{traj}.mp4", trajectory=traj,
                        with_depth=cfg.test.eval_depth,
                    )
                except Exception as e:  # video export must not abort scoring
                    print(f"warning: video export failed for {scene}: {e}")
            n_steps += 1

        self.finalize(scores, skip=cfg.test.eval_time_skip_steps)
        return scores

    def render_video(self, gaussians, ctx_extr, near, far, path, n_frames=60,
                     trajectory: str = "interpolate", with_depth: bool = False):
        """Trajectory video (render_video_generic parity,
        model_wrapper_erp.py:726-742,891-979): 6D-interpolation between the two
        context poses (default), or wobble/spin around the first context pose.
        With `with_depth`, also writes a `<stem>_depth.mp4` colormapped depth
        video (the reference stitches cube z-depth renders via z->distance +
        c2e, model_wrapper_erp.py:446-463; the direct-ERP renderer emits ray
        distance natively, so no stitching pass is needed)."""
        from ..geometry.transforms import trajectory_spin, trajectory_wobble

        ts = np.linspace(0, 1, n_frames)
        frames = []
        depth_frames = []
        for t in ts:
            if trajectory == "wobble":
                baseline = float(
                    np.linalg.norm(
                        np.asarray(ctx_extr[-1][:3, 3] - ctx_extr[0][:3, 3])
                    )
                )
                pose = trajectory_wobble(ctx_extr[0], 0.25 * baseline, float(t))
            elif trajectory == "spin":
                pose = trajectory_spin(ctx_extr[0], float(t))
            else:
                pose = interpolate_pose_6d(ctx_extr[0], ctx_extr[-1], float(t))
            out = self._decode_erp(
                gaussians,
                pose[None, None],
                jnp.full((1, 1), near),
                jnp.full((1, 1), far),
                render_depth=with_depth,
            )
            frames.append(np.asarray(out.color[0, 0]))
            if with_depth:
                d = np.asarray(out.depth[0, 0]) / np.maximum(
                    np.asarray(out.alpha[0, 0]), 1e-6
                )
                depth_frames.append(d)
        save_video(frames, path)
        if with_depth:
            lo = min(float(d.min()) for d in depth_frames)
            hi = max(float(d.max()) for d in depth_frames)
            save_video(
                [apply_depth_colormap(d, lo, hi) for d in depth_frames],
                Path(path).with_name(Path(path).stem + "_depth.mp4"),
            )

    def finalize(self, scores: dict, skip: int = 0):
        out = self.out
        if not scores:
            return
        keys = sorted(next(iter(scores.values())).keys())
        avg = {
            k: float(np.mean([s[k] for s in scores.values() if k in s]))
            for k in keys
        }
        (out / "scores_all_avg.json").write_text(json.dumps(avg, indent=2))
        for k in keys:
            (out / f"scores_{k}_all.json").write_text(
                json.dumps({s: v.get(k) for s, v in scores.items()}, indent=2)
            )
        # per-scene MSE artifact (reference on_test_end parity: mse_dict.json)
        (out / "mse_dict.json").write_text(
            json.dumps(
                {s: v.get("mse") for s, v in scores.items()}, indent=2
            )
        )
        # timing: skip warm-up steps (eval_time_skip_steps parity)
        bench = {}
        for tag, times in self.benchmarker.execution_times.items():
            t = times[skip:] if len(times) > skip else times
            bench[tag] = {
                "mean_s": float(np.mean(t)) if t else None,
                "count": len(times),
            }
        (out / "benchmark.json").write_text(json.dumps(bench, indent=2))
        self.benchmarker.dump_memory(out / "peak_memory.json")
        print("scores_all_avg:", avg)
