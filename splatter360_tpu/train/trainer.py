"""Training loop (SURVEY.md §2.7 parity with the Lightning Trainer + ModelWrapperERP).

Owns: data iteration with background prefetch, the jitted sharded train step,
periodic validation, TensorBoard scalars, console logs, checkpointing with
auto-resume, and the StepTracker feeding the bounded-sampler curriculum.
"""

from __future__ import annotations

import threading
import queue as queue_mod
import time
from pathlib import Path

import jax
import numpy as np

from ..data.dataset import SceneDataset, batches
from ..parallel.mesh import (
    create_mesh, data_sharding, replicated_sharding, shard_batch,
)
from ..utils.step_tracker import StepTracker
from . import checkpoint as ckpt
from .state import create_train_state, make_eval_step, make_train_step


class Prefetcher:
    """Background-thread batch prefetch (host pipeline, SURVEY.md §2.10)."""

    def __init__(self, iterator, depth: int = 2):
        self.queue: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._it = iterator
        self._done = object()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for item in self._it:
                self.queue.put(item)
        finally:
            self.queue.put(self._done)

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is self._done:
                return
            yield item


def _strip_scene(batch):
    return {k: v for k, v in batch.items() if k != "scene"}


class Trainer:
    def __init__(self, cfg, log_dir: str | None = None):
        self.cfg = cfg
        self.out = Path(cfg.output_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.step_tracker = StepTracker()
        self.mesh = create_mesh()
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir or str(self.out / "tb"))
        except Exception:
            self.writer = None

    def _log(self, step: int, metrics: dict, prefix: str = "train"):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)

    def fit(self):
        cfg = self.cfg
        dataset = SceneDataset(
            cfg.dataset, split="train", stage="train", seed=cfg.trainer.seed,
            step_fn=self.step_tracker.get_step,
        )
        batch_iter = Prefetcher(batches(dataset, cfg.trainer.batch_size))
        batch_iter = iter(batch_iter)

        first = next(batch_iter)
        state = create_train_state(
            jax.random.PRNGKey(cfg.trainer.seed), cfg.model, cfg.train,
            _strip_scene(first),
        )

        ckpt_dir = str(self.out / "checkpoints")
        if cfg.checkpointing.resume:
            state, resumed = ckpt.restore_checkpoint(ckpt_dir, state)
            if resumed:
                print(f"resumed from step {int(state.step)}")
        if cfg.checkpointing.pretrained_model and int(state.step) == 0:
            donor_state = state
            donor_state, ok = ckpt.restore_weights_only(
                cfg.checkpointing.pretrained_model, donor_state
            )
            if ok:
                state = state.replace(params=donor_state.params)
                print("warm-started weights from pretrained_model")

        rs = replicated_sharding(self.mesh)
        ds = data_sharding(self.mesh)
        state = jax.device_put(state, rs)
        step_fn = jax.jit(
            make_train_step(cfg.model, cfg.train),
            donate_argnums=(0,),
        )

        batch = first
        t0 = time.perf_counter()
        while int(state.step) < cfg.trainer.max_steps:
            sharded = shard_batch(self.mesh, _strip_scene(batch))
            state, metrics = step_fn(state, sharded)
            step = int(state.step)
            self.step_tracker.set_step(step)

            if step % cfg.trainer.print_log_every_n_steps == 0 or step <= 1:
                jax.block_until_ready(metrics["loss"])
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                msg = "; ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
                )
                print(f"step {step}: {msg} ({dt:.1f}s)")
                self._log(step, metrics)

            if step % cfg.checkpointing.every_n_train_steps == 0 and step > 0:
                ckpt.save_checkpoint(
                    ckpt_dir, step, jax.device_get(state),
                    cfg.checkpointing.max_to_keep,
                )

            batch = next(batch_iter)

        ckpt.save_checkpoint(
            ckpt_dir, int(state.step), jax.device_get(state),
            cfg.checkpointing.max_to_keep,
        )
        return state
