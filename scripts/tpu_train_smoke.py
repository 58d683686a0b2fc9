"""One real-TPU training step with the pallas render backend.

Asserts the loss and every gradient/param update is finite — the regression
this guards: linear-space transmittance underflow in the pallas compositor
produced NaN gradients on dense opaque init scenes (fixed by carrying log-T
through the forward; see ops/pallas/composite.py).

Run directly on the tunnel TPU: `python scripts/tpu_smoke.py` (JAX_PLATFORMS=axon
is ambient). Takes ~1-2 min of compile on first run.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import _make_batch, _tiny_encoder_cfg  # noqa: E402
from splatter360_tpu.train.losses import LossConfig  # noqa: E402
from splatter360_tpu.train.state import (  # noqa: E402
    OptimizerConfig, TrainConfig, create_train_state, make_train_step,
)


def main():
    print("devices:", jax.devices())
    h, w, b, v = 64, 128, 1, 2
    cfg = _tiny_encoder_cfg()
    tcfg = TrainConfig(
        optimizer=OptimizerConfig(max_steps=10),
        loss=LossConfig(lpips_weight=0.0, depth_weight=0.1),
        supervision="cubes",
        render_backend="pallas",
        max_per_tile=2048,
    )
    batch = _make_batch(b, v, h, w)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    step = jax.jit(make_train_step(cfg, tcfg))
    new_state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    loss = float(metrics["loss"])
    leaves = jax.tree_util.tree_leaves(new_state.params)
    finite = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    print(f"loss={loss:.5f} params_finite={finite} "
          f"metrics={ {k: float(np.asarray(val)) for k, val in metrics.items()} }")
    # second step from the updated state: catches NaNs that appear only after
    # the first update moves opacities/scales off their init.
    new_state2, metrics2 = step(new_state, batch)
    jax.block_until_ready(metrics2["loss"])
    loss2 = float(metrics2["loss"])
    leaves2 = jax.tree_util.tree_leaves(new_state2.params)
    finite2 = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves2)
    print(f"loss2={loss2:.5f} params_finite2={finite2}")
    assert np.isfinite(loss) and finite, "NaN in step 1"
    assert np.isfinite(loss2) and finite2, "NaN in step 2"
    print("TPU pallas train smoke: OK")


if __name__ == "__main__":
    main()
