"""Evaluation-index generation (SURVEY.md §2.8 parity with
src/evaluation/evaluation_index_generator.py:37-161 + the generate_* CLI wrappers).

For each test scene: fixed context (40, 40 + frame_interval) clamped to the scene
length (plus random unique middles for >2 contexts), and `num_target_views` random
non-repeating targets strictly between the contexts; `video` mode densifies targets to
every frame between the contexts (generate_video_evaluation_index.py behavior).
Writes {scene: {"context": [...], "target": [...]}} JSON.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..data.scene_io import list_scenes, load_scene


@dataclass(frozen=True)
class IndexGeneratorConfig:
    context_start: int = 40
    frame_interval: int = 100
    num_context_views: int = 2
    num_target_views: int = 3
    video: bool = False
    seed: int = 111


def generate_index(roots, split: str, out_path: str,
                   cfg: IndexGeneratorConfig = IndexGeneratorConfig()):
    rng = np.random.default_rng(cfg.seed)
    index = {}
    for root in roots:
        for scene in list_scenes(root, split):
            n = load_scene(root, split, scene)["poses"].shape[0]
            left = min(cfg.context_start, max(n - cfg.frame_interval - 1, 0))
            right = min(left + cfg.frame_interval, n - 1)
            if right <= left:
                continue
            ctx = [left, right]
            if cfg.num_context_views > 2:
                extra = rng.choice(
                    np.arange(left + 1, right),
                    cfg.num_context_views - 2,
                    replace=False,
                )
                ctx = sorted([left, *extra.tolist(), right])
            pool = np.arange(left + 1, right)
            if cfg.video:
                tgt = pool
            else:
                tgt = np.sort(
                    rng.choice(
                        pool, min(cfg.num_target_views, pool.size),
                        replace=False,
                    )
                )
            index[scene] = {
                "context": [int(i) for i in ctx],
                "target": [int(i) for i in tgt],
            }
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(index, indent=1))
    return index
