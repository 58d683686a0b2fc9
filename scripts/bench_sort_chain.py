"""Chained-timing sort probes on the chip (tunnel-safe; BASELINE.md note).

Probes the binning sort variants at the production K (~3.0M 2-op sort):
  flat2 / flat2u    current 2-op sort, stable vs unstable
  flat1 / flat1u    1-op sort (the tier-compaction sort), stable vs unstable
  seg{B}x2u         [B, K/B] row-batched 2-op unstable sort
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chain_time(fn, args, iters=20):
    @jax.jit
    def run(args):
        def body(i, a):
            return fn(a)

        return jax.lax.fori_loop(0, iters, body, args)

    out = run(args)
    _ = int(out[0][0])  # concrete readback = real device sync
    t0 = time.perf_counter()
    out = run(args)
    _ = int(out[0][0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    for k_total in (3014656,):  # 2N + tier caps at the north-star load
        keys = jax.random.randint(
            key, (k_total,), 0, 1 << 28, dtype=jnp.int32)
        vals = jnp.arange(k_total, dtype=jnp.int32)

        def make2(stable):
            def f(a):
                k, v = a
                ks, vs = jax.lax.sort((k, v), num_keys=1, is_stable=stable)
                # fold output back: flip one low bit of the input keys
                return (k ^ (vs[:1] & 1), v)
            return f

        def make1(stable):
            def f(a):
                k, v = a
                (ks,) = jax.lax.sort((k,), num_keys=1, is_stable=stable)
                return (k ^ (ks[:1] & 1), v)
            return f

        def makeseg(b, stable):
            def f(a):
                k, v = a
                ks, vs = jax.lax.sort(
                    (k.reshape(b, -1), v.reshape(b, -1)),
                    num_keys=1, dimension=1, is_stable=stable)
                return (k ^ (vs.reshape(-1)[:1] & 1), v)
            return f

        print(f"K={k_total}")
        print(f"  flat2  (stable)   {chain_time(make2(True), (keys, vals)):7.2f} ms")
        print(f"  flat2u (unstable) {chain_time(make2(False), (keys, vals)):7.2f} ms")
        print(f"  flat1  (stable)   {chain_time(make1(True), (keys, vals)):7.2f} ms")
        print(f"  flat1u (unstable) {chain_time(make1(False), (keys, vals)):7.2f} ms")
        for b in (8, 32):
            if k_total % b == 0:
                print(f"  seg{b}x2u          "
                      f"{chain_time(makeseg(b, False), (keys, vals)):7.2f} ms")


if __name__ == "__main__":
    main()
