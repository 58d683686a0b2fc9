"""Scatter/gather strategy bench at EXACT production shapes (round 2).

Production backward reduction: dcols [ROWS=16, L=524288] scatter-added into
[16, N=1048576] at int32 column indices gsel (13% live lanes, rest index N ->
dropped). Forward pack: jnp.take(attrs[16, N], gidx[K=2097152], axis=1).

Questions answered here:
  * does scatter cost scale with ROWS? (16 vs 8 vs 4 vs 1)
  * lane-major [ROWS, N] dest vs row-major [N, ROWS] dest (slab updates)
  * scatter vs sort-based inversion (2-op sort at K) + lane gather
  * gather cost vs rows; where-mask cost
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 1048576
L = 524288          # live-capped scatter lanes (l_cap * CHUNK)
K = 2 * N           # sorted instance cap

def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # ~53% of L lanes live (matches production: 277k of 524k), rest -> N (drop)
    gsel = jax.random.randint(k1, (L,), 0, N, dtype=jnp.int32)
    live = jax.random.uniform(k2, (L,)) < 0.53
    gsel = jnp.where(live, gsel, N)
    dcols16 = jax.random.normal(k3, (16, L), jnp.float32)
    dcolsT = jnp.asarray(dcols16.T)
    attrs16 = jax.random.normal(k3, (16, N), jnp.float32)
    gidx = jax.random.randint(k1, (K,), 0, N, dtype=jnp.int32)
    slot = jax.random.permutation(k2, jnp.arange(K, dtype=jnp.int32))
    mask = jax.random.uniform(k1, (K,)) < 0.8

    stages = {
        "scat_lane16": (jax.jit(lambda d, g: jnp.zeros((16, N)).at[:, g].add(
            d, mode="drop")), dcols16, gsel),
        "scat_lane8": (jax.jit(lambda d, g: jnp.zeros((8, N)).at[:, g].add(
            d[:8], mode="drop")), dcols16, gsel),
        "scat_lane4": (jax.jit(lambda d, g: jnp.zeros((4, N)).at[:, g].add(
            d[:4], mode="drop")), dcols16, gsel),
        "scat_lane1": (jax.jit(lambda d, g: jnp.zeros((1, N)).at[:, g].add(
            d[:1], mode="drop")), dcols16, gsel),
        "scat_row16": (jax.jit(lambda d, g: jnp.zeros((N, 16)).at[g].add(
            d, mode="drop")), dcolsT, gsel),
        "scat_row8": (jax.jit(lambda d, g: jnp.zeros((N, 8)).at[g].add(
            d[:, :8], mode="drop")), dcolsT, gsel),
        "scat_1d": (jax.jit(lambda d, g: jnp.zeros((N,)).at[g].add(
            d[0], mode="drop")), dcols16, gsel),
        "sort2op_L": (jax.jit(lambda g: jax.lax.sort(
            (g, jnp.arange(L, dtype=jnp.int32)), num_keys=1)[1]), gsel),
        "sort2op_K": (jax.jit(lambda s: jax.lax.sort(
            (s, jnp.arange(K, dtype=jnp.int32)), num_keys=1)[1]), slot),
        "gather_lane16_K": (jax.jit(lambda a, i: jnp.take(a, i, axis=1)),
                            attrs16, gidx),
        "gather_lane8_K": (jax.jit(lambda a, i: jnp.take(a[:8], i, axis=1)),
                           attrs16, gidx),
        "gather+mask_K": (jax.jit(lambda a, i, m: jnp.where(
            m[None, :], jnp.take(a, i, axis=1), 0.0)), attrs16, gidx, mask),
        "gather_lane16_L": (jax.jit(lambda a, i: jnp.take(a, i[:L], axis=1)),
                            attrs16, gidx),
        "cumsum_lane16_K": (jax.jit(
            lambda d: jnp.cumsum(d, axis=1)),
            jax.random.normal(k3, (16, K), jnp.float32)),
        "segsum_matmul": (jax.jit(  # [16,K] x onehot via block matmul? sanity: plain matmul cost [16,K]x[K,128]
            lambda d, w: d @ w),
            jax.random.normal(k3, (16, K), jnp.float32),
            jax.random.normal(k3, (K, 128), jnp.float32)),
    }
    import os
    which = os.environ.get("SPLAT360_SCATTER_STAGES", "").split(",")
    for name, (f, *args) in stages.items():
        if which != [""] and name not in which:
            continue
        ms = timeit(f, *args)
        print(f"{name:18s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
