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


def partial_warm_start(params: Any, donor: Any) -> Any:
    """Copy donor leaves into params wherever the path + shape match (the reference's
    key-intersection UniMatch warm start)."""
    flat_params = dict(
        jax.tree_util.tree_flatten_with_path(params)[0]
    )
    flat_donor = dict(jax.tree_util.tree_flatten_with_path(donor)[0])
    merged = {}
    for path, leaf in flat_params.items():
        cand = flat_donor.get(path)
        if cand is not None and getattr(cand, "shape", None) == getattr(
            leaf, "shape", None
        ):
            merged[path] = cand
        else:
            merged[path] = leaf
    treedef = jax.tree_util.tree_structure(params)
    leaves = [
        merged[path]
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
