"""Micro-bench of pack-gradient strategies on TPU.

The pack gather `attrs[gidx]` ([N,16] -> [K,16]) has an autograd transpose that
scatter-adds K=2.6M rows back into N=1M gaussians — measured ~190 ms, the single
biggest cost in the fwd+bwd pipeline. Candidate replacements measured here:

  scatter_add_16   the status quo: .at[gidx].add(rows16)
  scatter_add_10   same but only the 10 gradient-carrying columns
  scatter_iota     build inverse permutation via int32 unique scatter
  sort_pairs       build inverse permutation via a second int32 pair sort
  gather_rows10    emission-order row gather [k_pad, 10]
  reshape_sum      fast-tier [n, 4, 16] -> sum(1)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 2 * 512 * 1024
K = 5 * N // 2
K_PAD = 4 * N + (N // 32) * 32


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    gidx = jax.random.randint(key, (K,), 0, N, dtype=jnp.int32)
    rows16 = jax.random.normal(key, (K, 16), jnp.float32)
    rows10 = rows16[:, :10]
    slot_sorted = jax.random.permutation(key, K_PAD)[:K].astype(jnp.int32)
    inv = jax.random.randint(key, (K_PAD,), 0, K, dtype=jnp.int32)
    big = jax.random.normal(key, (N, 4, 16), jnp.float32)

    import os

    which = os.environ.get("SPLAT360_SCATTER_STAGES", "").split(",")
    stages = {
        "scatter_add_16": lambda: (
            jax.jit(lambda r: jnp.zeros((N, 16)).at[gidx].add(r)), rows16),
        "scatter_add_10": lambda: (
            jax.jit(lambda r: jnp.zeros((N, 10)).at[gidx].add(r)), rows10),
        "scatter_iota": lambda: (
            jax.jit(lambda s: jnp.full((K_PAD,), K, jnp.int32)
                    .at[s].set(jnp.arange(K, dtype=jnp.int32),
                               unique_indices=True)), slot_sorted),
        "sort_pairs_K": lambda: (
            jax.jit(lambda s: jax.lax.sort(
                (s, jnp.arange(K, dtype=jnp.int32)), num_keys=1)[1]),
            slot_sorted),
        "gather_rows16": lambda: (
            jax.jit(lambda r, i: r[jnp.clip(i, 0, K - 1)]), rows16, inv),
        "gather_int_K": lambda: (
            jax.jit(lambda i: gidx[jnp.clip(i, 0, K - 1)]), inv),
        "reshape_sum": lambda: (jax.jit(lambda b: b.sum(axis=1)), big),
    }
    for name, build in stages.items():
        if which != [""] and name not in which:
            continue
        print(f"... {name}", file=sys.stderr, flush=True)
        f, *args = build()
        ms = timeit(f, *args)
        print(f"{name:16s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
