#!/usr/bin/env python
"""Microbench: does a bf16 1-D scatter-add beat the f32 one?

The ngp backward's floor is the table-gradient scatter at ~9 ns per
scattered f32 element (docs/PERFORMANCE.md).  tiny-cuda-nn itself
accumulates hash-table gradients in fp16, so a bf16 accumulate is
tcnn-faithful in spirit; whether it is FASTER on v5e depends on whether
the random-write price is byte-count- or transaction-bound.  Measures:

  a) f32 1-D scatter-add (the current `_gather_rows` transpose floor)
  b) bf16 values scattered into a bf16 accumulator
  c) bf16 values upcast on the fly into an f32 accumulator
     (precision-safe: only the row traffic is bf16)

Run on the real chip: python scripts/bench_scatter_bf16.py [M] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    v = jax.random.normal(key, (M,), dtype=jnp.float32)
    v16 = v.astype(jnp.bfloat16)

    @jax.jit
    def f32(idx, a):
        return jnp.zeros((T,), jnp.float32).at[idx].add(a)

    @jax.jit
    def bf16_acc(idx, a16):
        return jnp.zeros((T,), jnp.bfloat16).at[idx].add(a16)

    @jax.jit
    def bf16_rows_f32_acc(idx, a16):
        return jnp.zeros((T,), jnp.float32).at[idx].add(
            a16.astype(jnp.float32)
        )

    t_f32 = timeit(f32, idx, v)
    t_b16 = timeit(bf16_acc, idx, v16)
    t_mix = timeit(bf16_rows_f32_acc, idx, v16)
    print(f"M={M} T={T}")
    print(f"f32 scatter-add          {t_f32:7.2f} ms "
          f"({t_f32 / M * 1e6:.2f} ns/elem)")
    print(f"bf16 scatter-add         {t_b16:7.2f} ms "
          f"({t_b16 / M * 1e6:.2f} ns/elem)")
    print(f"bf16 rows -> f32 acc     {t_mix:7.2f} ms "
          f"({t_mix / M * 1e6:.2f} ns/elem)")


if __name__ == "__main__":
    main()
