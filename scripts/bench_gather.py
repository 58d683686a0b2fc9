"""Microbench: row-gather strategies for the instance pack (TPU).

The pack gathers K~2.1M rows of [N, 16] f32 attrs (ops/pallas/composite.py
::_render_core_fwd). tiling.py's cost model says ~10 ns/index, but the pack
stage measures ~33 ns/row — this sweep isolates what the per-row cost actually
depends on (row width, dtype, axis, split count) to pick the cheapest layout.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 2 * 512 * 1024
K = 2 * N


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms


def main():
    key = jax.random.PRNGKey(0)
    gidx = jax.random.randint(key, (K,), 0, N, dtype=jnp.int32)
    # depth-sorted-within-tile indices are locally random: use raw random
    attrs16 = jax.random.normal(key, (N, 16), jnp.float32)
    attrs8 = attrs16[:, :8]
    attrs4 = attrs16[:, :4]
    attrs1 = attrs16[:, 0]
    attrs16T = attrs16.T
    attrs16_bf = attrs16.astype(jnp.bfloat16)

    cases = {
        "rows16_f32": jax.jit(lambda a, i: a[i]),
        "rows8_f32": jax.jit(lambda a, i: a[i]),
        "rows4_f32": jax.jit(lambda a, i: a[i]),
        "rows1_f32": jax.jit(lambda a, i: a[i]),
        "rows16_bf16": jax.jit(lambda a, i: a[i]),
        "take_ax1_16": jax.jit(lambda a, i: jnp.take(a, i, axis=1)),
        "col_by_col16": jax.jit(
            lambda a, i: jnp.stack([a[:, c][i] for c in range(16)], 1)
        ),
    }
    args = {
        "rows16_f32": (attrs16, gidx),
        "rows8_f32": (attrs8, gidx),
        "rows4_f32": (attrs4, gidx),
        "rows1_f32": (attrs1, gidx),
        "rows16_bf16": (attrs16_bf, gidx),
        "take_ax1_16": (attrs16T, gidx),
        "col_by_col16": (attrs16, gidx),
    }
    print(f"devices: {jax.devices()}  K={K} N={N}", file=sys.stderr)
    for name, fn in cases.items():
        try:
            ms = timeit(fn, *args[name])
            print(f"{name:14s} {ms:8.2f} ms   {ms * 1e6 / K:6.1f} ns/row")
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}")

    # scatter-add for reference (the gradient direction)
    upd16 = jax.random.normal(key, (K, 16), jnp.float32)
    scat = jax.jit(
        lambda u, i: jnp.zeros((N, 16), jnp.float32).at[i].add(u)
    )
    ms = timeit(scat, upd16, gidx)
    print(f"{'scatter16_f32':14s} {ms:8.2f} ms   {ms * 1e6 / K:6.1f} ns/row")


if __name__ == "__main__":
    main()
