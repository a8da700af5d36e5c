#!/usr/bin/env python
"""Microbench: can packing 2 f32 features per scattered element beat two
1-D f32 scatter-adds?

The ngp table-gradient floor is the per-feature 1-D scatter-add at ~9 ns
per scattered element (docs/PERFORMANCE.md).  Each hash-table row carries
n_features_per_level = 2 f32 features scattered at the SAME index, so if
the memory system prices a random 8-byte write like a 4-byte one, packing
the two features into one complex64 element (or one f64-like pair) halves
the scattered-element count.  This measures:

  a) 2x f32 1-D scatter-add (the current `_gather_rows` transpose)
  b) 1x complex64 1-D scatter-add at the same indices
  c) 1x f32 1-D scatter-add (lower bound if packing were free)

Run on the real chip: python scripts/bench_scatter_pack.py [M] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152  # rows
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288  # table rows

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    v0 = jax.random.normal(key, (M,), dtype=jnp.float32)
    v1 = v0 * 1.5 + 1.0

    @jax.jit
    def two_f32(idx, a, b):
        c0 = jnp.zeros((T,), jnp.float32).at[idx].add(a)
        c1 = jnp.zeros((T,), jnp.float32).at[idx].add(b)
        return c0, c1

    @jax.jit
    def one_c64(idx, a, b):
        z = jax.lax.complex(a, b)
        acc = jnp.zeros((T,), jnp.complex64).at[idx].add(z)
        return jnp.real(acc), jnp.imag(acc)

    @jax.jit
    def one_f32(idx, a):
        return jnp.zeros((T,), jnp.float32).at[idx].add(a)

    def bench(fn, *args, iters=20):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
        return (time.time() - t0) / iters * 1e3

    a_ref, b_ref = jax.device_get(two_f32(idx, v0, v1))
    a_c, b_c = jax.device_get(one_c64(idx, v0, v1))
    import numpy as np

    np.testing.assert_allclose(a_ref, a_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b_ref, b_c, rtol=1e-5, atol=1e-5)
    print(f"M={M} T={T}")
    print(f"  2x f32 scatter : {bench(two_f32, idx, v0, v1):8.2f} ms")
    print(f"  1x c64 scatter : {bench(one_c64, idx, v0, v1):8.2f} ms")
    print(f"  1x f32 scatter : {bench(one_f32, idx, v0):8.2f} ms")


if __name__ == "__main__":
    main()
