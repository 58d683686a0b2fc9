"""Orbax checkpointing with the reference's three load modes (SURVEY.md §5).

  * full resume (params + optimizer state + step), auto-resume from latest
    (src/main.py:172-200 `last.ckpt` behavior);
  * weights-only fine-tune (load params, fresh optimizer);
  * partial warm-start: merge a donor params pytree by key intersection
    (encoder_costvolume.py:141-179 UniMatch-weights pattern).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = -1) -> ocp.CheckpointManager:
    opts = ocp.CheckpointManagerOptions(
        max_to_keep=None if max_to_keep < 0 else max_to_keep,
        create=True,
    )
    return ocp.CheckpointManager(
        Path(directory).absolute(), options=opts
    )


def save_checkpoint(directory: str, step: int, state, max_to_keep: int = -1):
    mgr = _manager(directory, max_to_keep)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not Path(directory).exists():
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state, step: Optional[int] = None):
    """Full resume: returns state with params/opt_state/step restored."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return state, False
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return (
        state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ),
        True,
    )


def restore_weights_only(directory: str, state, step: Optional[int] = None):
    """Weights-only fine-tune: restores params, keeps a fresh optimizer."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return state, False
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(params=restored["params"]), True


def partial_warm_start(params: Any, donor: Any, report: bool = False) -> Any:
    """Copy donor leaves into params wherever the path + shape match (the reference's
    key-intersection UniMatch warm start). report=True also returns the number
    of replaced leaves (so callers can fail loudly on a 0-match donor)."""
    flat_params = dict(
        jax.tree_util.tree_flatten_with_path(params)[0]
    )
    flat_donor = dict(jax.tree_util.tree_flatten_with_path(donor)[0])
    merged = {}
    n_matched = 0
    for path, leaf in flat_params.items():
        cand = flat_donor.get(path)
        if cand is not None and getattr(cand, "shape", None) == getattr(
            leaf, "shape", None
        ):
            merged[path] = cand
            n_matched += 1
        else:
            merged[path] = leaf
    treedef = jax.tree_util.tree_structure(params)
    leaves = [
        merged[path]
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return (tree, n_matched) if report else tree


def warm_start_backbones(params: Any, path: str, num_layers: int = 6):
    """Reference UniMatch warm start (encoder_costvolume.py:141-179): convert
    a LOCAL gmdepth torch checkpoint (e.g.
    gmdepth-scale1-resumeflowthings-scannet) and graft it into BOTH multiview
    backbones (cube + ERP), key-intersection style. Wired to
    `checkpointing.pretrained_backbone`. Returns (merged_params, n_leaves)."""
    from ..utils.torch_convert import (
        convert_unimatch_backbone, load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    bb = convert_unimatch_backbone(sd, num_layers=num_layers)
    donor = {"params": {"backbone_cube": bb, "backbone_erp": bb}}
    merged, n = partial_warm_start(params, donor, report=True)
    if n == 0:
        raise ValueError(
            f"checkpointing.pretrained_backbone={path!r}: 0 parameter leaves "
            f"matched the model (wrong checkpoint, or the model has no "
            f"backbone_cube/backbone_erp modules)"
        )
    return merged, n


def warm_start_mono(params: Any, path: str):
    """Reference DINOv2/Depth-Anything mono-branch load
    (encoder_costvolume.py:107-125 torch.hub): convert a LOCAL ViT torch
    checkpoint into the frozen `dino` module, resampling pos_embed to the
    model's token grid. Wired to `checkpointing.pretrained_mono`; requires
    model.add_mono_feat. Returns (merged_params, n_leaves)."""
    from ..utils.torch_convert import convert_dinov2, load_torch_state_dict

    dino = params.get("params", {}).get("dino")
    if dino is None:
        raise ValueError(
            "checkpointing.pretrained_mono is set but the model has no "
            "`dino` module — enable model.add_mono_feat"
        )
    n_tok = dino["pos_embed"].shape[1]
    g = int(round(n_tok ** 0.5))
    if g * g != n_tok:  # non-square token grids unsupported by the resampler
        raise ValueError(f"non-square dino token grid ({n_tok} tokens)")
    sd = load_torch_state_dict(path)
    donor = {"params": {"dino": convert_dinov2(sd, grid_hw=(g, g))}}
    merged, n = partial_warm_start(params, donor, report=True)
    if n == 0:
        raise ValueError(
            f"checkpointing.pretrained_mono={path!r}: 0 parameter leaves "
            f"matched the model's dino module (wrong vit_type?)"
        )
    return merged, n


def resolve_checkpoint_uri(path: str | None) -> str | None:
    """Resolve `wandb://run_id[:version]` checkpoint URIs to local paths
    (reference: src/misc/wandb_tools.py:42-62 downloads the run's latest
    COMMITTED model artifact via the wandb API).

    This environment has zero network egress, so resolution is two-stage:
      1. if the `wandb` SDK is importable AND WANDB_API_KEY is set, use the
         API exactly like the reference (latest model artifact, or the
         requested vN version);
      2. otherwise look in the local artifact store
         $SPLAT360_WANDB_ARTIFACTS/<run_id>/<version>/ (version dirs named
         vN; highest N wins when no version is requested).
    Non-wandb paths pass through unchanged.
    """
    if path is None or not str(path).startswith("wandb://"):
        return path
    run_id, *rest = str(path)[len("wandb://"):].split(":")
    if len(rest) > 1:
        raise ValueError(f"invalid wandb checkpoint URI {path!r}")
    version = rest[0] if rest else None

    try:
        if os.environ.get("WANDB_API_KEY"):
            import wandb

            api = wandb.Api()
            run = api.run(run_id)
            chosen = None
            for artifact in run.logged_artifacts():
                if artifact.type != "model" or artifact.state != "COMMITTED":
                    continue
                if version is None:
                    if chosen is None or int(artifact.version[1:]) > int(
                        chosen.version[1:]
                    ):
                        chosen = artifact
                elif version == artifact.version:
                    chosen = artifact
                    break
            if chosen is not None:
                root = Path("checkpoints") / run_id.replace("/", "_")
                chosen.download(root=str(root))
                return str(root)
    except Exception as e:
        print(f"warning: wandb API resolution failed ({e}); "
              f"falling back to the local artifact store")

    store = Path(
        os.environ.get("SPLAT360_WANDB_ARTIFACTS", "wandb_artifacts")
    )
    run_dir = store / run_id.replace("/", "_")
    if not run_dir.is_dir():
        raise FileNotFoundError(
            f"cannot resolve {path!r}: no wandb API access and no local "
            f"artifact dir {run_dir} (set SPLAT360_WANDB_ARTIFACTS)"
        )
    if version is None:
        versions = sorted(
            (d for d in run_dir.iterdir()
             if d.is_dir() and d.name.startswith("v")),
            key=lambda d: int(d.name[1:]),
        )
        if not versions:
            raise FileNotFoundError(f"no vN version dirs under {run_dir}")
        return str(versions[-1])
    return str(run_dir / version)
