"""Scene dataset -> training/eval example stream (SURVEY.md §2.2 parity).

Host-side numpy pipeline (DatasetHM3D equivalent, dataset_hm3d.py:24-410): loads scene
npz files, samples context/target frames via a view sampler, converts ERP images into
cube faces on the HOST only for the small context-input faces... actually e2c runs
ON DEVICE inside the jitted step in this framework (SURVEY.md §7 design stance); the
host pipeline only crops/samples frames and stacks arrays. Baseline filtering
(insufficient camera baseline -> skip, ref:260-277) is applied.

Batching: `batch_examples` stacks examples and pads nothing (static shapes come from
fixed v_ctx/v_tgt and image sizes).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .scene_io import list_scenes, load_scene
from .view_sampler import (
    BoundedSamplerConfig,
    ViewSamplerBounded,
    ViewSamplerEvaluation,
)


@dataclass(frozen=True)
class DatasetConfig:
    roots: tuple = ()
    image_shape: tuple = (512, 1024)
    near: float = 0.1
    far: float = 10.0
    baseline_epsilon: float = 1e-3
    view_sampler: BoundedSamplerConfig = dataclasses.field(
        default_factory=BoundedSamplerConfig
    )
    evaluation_index_path: Optional[str] = None
    overfit_to_scene: Optional[str] = None


def _frames_to_views(scene_data, indices, cfg: DatasetConfig):
    rgb = scene_data["rgb"][indices].astype(np.float32) / 255.0  # [v, H, W, 3]
    depth = scene_data["depth_m"][indices]  # [v, H, W]
    poses = scene_data["poses"][indices]  # [v, 4, 4]
    v = len(indices)
    return {
        "extrinsics_sphere": poses.astype(np.float32),
        "image_sphere": rgb,
        "depth_sphere": depth.astype(np.float32),
        "near": np.full((v,), cfg.near, np.float32),
        "far": np.full((v,), cfg.far, np.float32),
        "index": np.asarray(indices, np.int32),
    }


class SceneDataset:
    """Iterable over (context, target) examples."""

    def __init__(
        self,
        cfg: DatasetConfig,
        split: str = "train",
        stage: str = "train",
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        step_fn=None,
    ):
        self.cfg = cfg
        self.split = split
        self.stage = stage
        self.rng = np.random.default_rng(seed + shard_index)
        self.step_fn = step_fn or (lambda: 0)
        scenes = []
        for root in cfg.roots:
            scenes += [(root, s) for s in list_scenes(root, split)]
        if cfg.overfit_to_scene is not None:
            scenes = [rs for rs in scenes if rs[1] == cfg.overfit_to_scene]
        # per-host sharding (ref: chunk_index % num_workers, dataset_hm3d.py:108-114)
        self.scenes = scenes[shard_index::num_shards]
        self._cache: dict = {}
        if stage != "train" and cfg.evaluation_index_path:
            self.eval_sampler = ViewSamplerEvaluation(cfg.evaluation_index_path)
        else:
            self.eval_sampler = None
        self.train_sampler = ViewSamplerBounded(cfg.view_sampler, stage=stage)

    def _load(self, root, scene):
        key = (root, scene)
        if key not in self._cache:
            if len(self._cache) > 4:
                self._cache.clear()
            self._cache[key] = load_scene(root, self.split, scene)
        return self._cache[key]

    def _example(self, root, scene):
        data = self._load(root, scene)
        n = data["poses"].shape[0]
        if self.eval_sampler is not None:
            sampled = self.eval_sampler.sample(scene)
            if sampled is None:
                return None
            ctx_idx, tgt_idx = sampled
            if ctx_idx.max() >= n or tgt_idx.max() >= n:
                return None
        else:
            try:
                ctx_idx, tgt_idx = self.train_sampler.sample(
                    n, self.rng, self.step_fn()
                )
            except ValueError:
                return None
        # baseline filter (ref dataset_hm3d.py:260-277)
        poses = data["poses"]
        baseline = np.linalg.norm(
            poses[ctx_idx[0], :3, 3] - poses[ctx_idx[-1], :3, 3]
        )
        if self.stage == "train" and baseline < self.cfg.baseline_epsilon:
            return None
        return {
            "context": _frames_to_views(data, ctx_idx, self.cfg),
            "target": _frames_to_views(data, tgt_idx, self.cfg),
            "scene": scene,
        }

    def __iter__(self) -> Iterator[dict]:
        if self.stage == "train":
            while True:
                order = self.rng.permutation(len(self.scenes))
                for i in order:
                    ex = self._example(*self.scenes[i])
                    if ex is not None:
                        yield ex
        else:
            for root, scene in self.scenes:
                ex = self._example(root, scene)
                if ex is not None:
                    yield ex


def batch_examples(examples):
    """Stack a list of examples into a batch (leading batch axis); drops 'scene'."""
    out = {}
    for part in ("context", "target"):
        out[part] = {
            k: np.stack([e[part][k] for e in examples])
            for k in examples[0][part]
        }
    out["scene"] = [e["scene"] for e in examples]
    return out


def batches(dataset: SceneDataset, batch_size: int) -> Iterator[dict]:
    buf = []
    for ex in dataset:
        buf.append(ex)
        if len(buf) == batch_size:
            yield batch_examples(buf)
            buf = []
