"""CLI entry point (SURVEY.md §2.1 parity with src/main.py).

Usage:
  python -m splatter360_tpu.main [config.yaml] [mode=train|test] [a.b=c ...]

Builds the typed RootConfig from YAML + dotted overrides, then dispatches train/test.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

from .config import RootConfig, load_config


def main(argv=None):
    from .utils.platform import pin_platform_from_env

    pin_platform_from_env()
    from .parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    argv = list(sys.argv[1:] if argv is None else argv)
    path = None
    if argv and "=" not in argv[0]:
        path = argv.pop(0)
    cfg = load_config(path, argv)

    if cfg.mode == "train":
        from .train.trainer import Trainer

        Trainer(cfg).fit()
    elif cfg.mode == "test":
        import jax

        from .data.dataset import SceneDataset, batch_examples
        from .train import checkpoint as ckpt
        from .train.evaluator import Evaluator
        from .train.state import create_train_state

        dataset = SceneDataset(cfg.dataset, split="test", stage="test")
        first = None
        for ex in dataset:
            first = batch_examples([ex])
            break
        if first is None:
            raise SystemExit("no test scenes found")
        state = create_train_state(
            jax.random.PRNGKey(0), cfg.model, cfg.train,
            {k: v for k, v in first.items() if k != "scene"},
        )
        ckpt_dir = ckpt.resolve_checkpoint_uri(cfg.checkpointing.load) or str(
            Path(cfg.output_dir) / "checkpoints"
        )
        state, ok = ckpt.restore_weights_only(ckpt_dir, state)
        if not ok:
            print("warning: no checkpoint restored; evaluating random weights")
        # LPIPS in the eval protocol (reference metrics.py:25-38) — seeded
        # deterministic features unless train.loss.lpips_weights points at a
        # real checkpoint (make_lpips_fn prints the deviation loudly).
        from .train.lpips_jax import make_lpips_fn

        Evaluator(
            cfg, state, lpips_fn=make_lpips_fn(cfg.train.loss.lpips_weights)
        ).run()
    elif cfg.mode == "generate_index":
        # Evaluation-index generation (SURVEY.md §2.8,
        # src/evaluation/evaluation_index_generator.py + src/scripts/generate_*.py)
        from .evaluation.index_generator import (
            IndexGeneratorConfig, generate_index,
        )

        out = str(Path(cfg.output_dir) / "evaluation_index.json")
        generate_index(
            cfg.dataset.roots, "test", out,
            IndexGeneratorConfig(
                num_context_views=cfg.dataset.view_sampler.num_context_views
            ),
        )
        print(f"wrote {out}")
    elif cfg.mode == "compute_metrics":
        # Offline metric recomputation (src/scripts/compute_metrics.py parity):
        # compares each method dir under <output_dir>/methods to <output_dir>/gt.
        from .evaluation.metric_computer import compute_metrics_offline

        base = Path(cfg.output_dir)
        methods = {
            p.name: str(p) for p in sorted((base / "methods").iterdir())
            if p.is_dir()
        }
        if not methods:
            raise SystemExit(f"no method dirs under {base / 'methods'}")
        results = compute_metrics_offline(
            str(base / "gt"), methods, str(base / "metrics")
        )
        print(json.dumps(results, indent=2))
    else:
        raise SystemExit(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    main()
