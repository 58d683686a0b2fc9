"""View samplers (SURVEY.md §2.2 parity with src/dataset/view_sampler/*).

  * bounded: training curriculum — random context gap in [min, max] with a linear
    warm-up on both the gap and the max distance of targets between the contexts
    (view_sampler_bounded.py:24-121); test mode pins context to
    (test_context_start, +max_gap) — frame-40 start like the reference's
    index generator (evaluation_index_generator.py:116-127);
  * evaluation: fixed {scene: {context: [...], target: [...]}} JSON index
    (view_sampler_evaluation.py:24-67);
  * all: (all, all) frames — used by the evaluation-index generator;
  * arbitrary: fixed index lists from config.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class BoundedSamplerConfig:
    num_context_views: int = 2
    num_target_views: int = 4
    min_distance_between_context_views: int = 40
    max_distance_between_context_views: int = 100
    min_distance_to_context_views: int = 0
    warm_up_steps: int = 0
    initial_min_distance_between_context_views: int = 10
    initial_max_distance_between_context_views: int = 20
    # test-mode left context frame: the reference skips the first 40 frames
    # (near-static starts, evaluation_index_generator.py:116-127); clamped
    # when the scene is too short for start + max_gap
    test_context_start: int = 40


class ViewSamplerBounded:
    def __init__(self, cfg: BoundedSamplerConfig, stage: str = "train"):
        self.cfg = cfg
        self.stage = stage

    def _schedule(self, global_step: int, initial: int, final: int) -> int:
        cfg = self.cfg
        if cfg.warm_up_steps <= 0:
            return final
        frac = min(global_step / cfg.warm_up_steps, 1.0)
        return round(initial + frac * (final - initial))

    def sample(self, num_frames: int, rng: np.random.Generator,
               global_step: int = 0):
        cfg = self.cfg
        num_ctx = cfg.num_context_views
        if self.stage == "test":
            max_gap = min(cfg.max_distance_between_context_views, num_frames - 1)
            min_gap = max_gap
            index_left = max(
                min(cfg.test_context_start, num_frames - 1 - max_gap), 0
            )
        else:
            max_gap = self._schedule(
                global_step,
                cfg.initial_max_distance_between_context_views,
                cfg.max_distance_between_context_views,
            )
            min_gap = self._schedule(
                global_step,
                cfg.initial_min_distance_between_context_views,
                cfg.min_distance_between_context_views,
            )
            max_gap = min(max_gap, num_frames - 1)
            min_gap = max(min(min_gap, max_gap), 1)
            index_left = None
        if num_frames < 2:
            raise ValueError("scene too short")
        gap = int(rng.integers(min_gap, max_gap + 1))
        if index_left is None:
            index_left = int(rng.integers(0, num_frames - gap))
        index_right = index_left + gap

        # intermediate contexts for >2 context views
        ctx = [index_left, index_right]
        if num_ctx > 2:
            extra = rng.choice(
                np.arange(index_left + 1, index_right), num_ctx - 2, replace=False
            )
            ctx = sorted([index_left, *extra.tolist(), index_right])

        lo = index_left + self.cfg.min_distance_to_context_views
        hi = index_right - self.cfg.min_distance_to_context_views
        pool = np.arange(lo, hi + 1)
        target = rng.choice(
            pool, min(cfg.num_target_views, pool.size), replace=False
        )
        return np.asarray(ctx, np.int64), np.sort(target).astype(np.int64)


class ViewSamplerEvaluation:
    def __init__(self, index_path: str):
        self.index = json.loads(Path(index_path).read_text())

    def sample(self, scene: str):
        entry = self.index.get(scene)
        if entry is None:
            return None
        return (
            np.asarray(entry["context"], np.int64),
            np.asarray(entry["target"], np.int64),
        )


class ViewSamplerAll:
    def sample(self, num_frames: int):
        idx = np.arange(num_frames, dtype=np.int64)
        return idx, idx


@dataclass(frozen=True)
class ArbitrarySamplerConfig:
    context_views: Sequence[int] = (0, 1)
    target_views: Sequence[int] = (0,)


class ViewSamplerArbitrary:
    def __init__(self, cfg: ArbitrarySamplerConfig):
        self.cfg = cfg

    def sample(self):
        return (
            np.asarray(self.cfg.context_views, np.int64),
            np.asarray(self.cfg.target_views, np.int64),
        )
