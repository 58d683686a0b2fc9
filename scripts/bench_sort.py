"""Microbench of sort strategies for tile binning on TPU.

What it probes (sizes around the north-star load: K_emit ~= 3.67M keys):
  flat1/flat2/flat3   jax.lax.sort of [K] with 1/2/3 int32 operands
  seg{B}              segmented sort: [B, K/B] along the last axis, 2 operands
  topk                jax.lax.top_k as a substitute (keys only)
  gatherK             lane gather of [16, N] -> [16, K] (permutation apply)
  scatterK            unique int32 scatter of K indices (inverse permutation)
"""

import sys
import time

import jax
import jax.numpy as jnp

def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)

    for k_total in (1 << 20, 2 << 20, 3670016, 6 << 20):
        keys = jax.random.randint(key, (k_total,), 0, 1 << 28, dtype=jnp.int32)
        vals = jnp.arange(k_total, dtype=jnp.int32)
        v2 = vals + 1

        f1 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1))
        f2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=1))
        f3 = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1))
        # unstable variants: XLA's stable lowering widens the comparator with
        # an iota tiebreak; binning doesn't need stability when ties are
        # quantized-depth-equal within one tile (r5 probe)
        f1u = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
        f2u = jax.jit(
            lambda x, y: jax.lax.sort((x, y), num_keys=1, is_stable=False))
        # single-operand i64 with the payload packed in the low 32 bits
        def packed_i64(x, y):
            kv = (x.astype(jnp.int64) << 32) | y.astype(jnp.uint32).astype(jnp.int64)
            (s,) = jax.lax.sort((kv,), num_keys=1, is_stable=False)
            return (s >> 32).astype(jnp.int32), s.astype(jnp.int32)
        fp64 = jax.jit(packed_i64)
        print(f"K={k_total}")
        print(f"  flat1 {timeit(f1, keys):8.2f} ms")
        print(f"  flat1u {timeit(f1u, keys):8.2f} ms")
        print(f"  flat2 {timeit(f2, keys, vals):8.2f} ms")
        print(f"  flat2u {timeit(f2u, keys, vals):8.2f} ms")
        print(f"  flat3 {timeit(f3, keys, vals, v2):8.2f} ms")
        print(f"  pack64u {timeit(fp64, keys, vals):8.2f} ms")
        for b in (8, 32, 128):
            if k_total % b:
                continue
            kb = keys.reshape(b, -1)
            vb = vals.reshape(b, -1)
            fs = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=1, dimension=1))
            print(f"  seg{b:<4d} {timeit(fs, kb, vb):8.2f} ms  (rows of {k_total//b})")

    n = 1 << 20
    k_emit = 3670016
    attrs = jax.random.normal(key, (16, n), jnp.float32)
    gidx = jax.random.randint(key, (k_emit,), 0, n, dtype=jnp.int32)
    fg = jax.jit(lambda a, i: jnp.take(a, i, axis=1))
    print(f"gather [16,{n}] -> [16,{k_emit}]: {timeit(fg, attrs, gidx):8.2f} ms")

    perm = jax.random.permutation(key, k_emit)
    fsc = jax.jit(
        lambda p: jnp.zeros((k_emit,), jnp.int32)
        .at[p]
        .set(jnp.arange(k_emit, dtype=jnp.int32), unique_indices=True)
    )
    print(f"scatter inv-perm K={k_emit}: {timeit(fsc, perm):8.2f} ms")

    # sort with f32 key (depth) instead of int32
    dk = jax.random.uniform(key, (k_emit,), jnp.float32)
    ff = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=1))
    print(f"flat2 f32key K={k_emit}: {timeit(ff, dk, gidx):8.2f} ms")


if __name__ == "__main__":
    main()
