#!/usr/bin/env python
"""Microbench: VMEM-accumulator scatter-add in Pallas vs XLA's HBM
scatter-add.

The ngp table-gradient floor is ~9 ns per scattered element through the
HBM path (docs/PERFORMANCE.md; bf16 and dedup variants measured worse).
A per-level hash table slice (2^19 rows x 1 feature f32 = 2 MB) fits in
VMEM, so a Pallas kernel can keep the ACCUMULATOR resident in VMEM and
stream contribution tiles through, paying a serial per-element dynamic
VMEM accumulate instead of a random HBM write.  Whether that wins
depends on the scalar-accumulate throughput this measures.

Run on the real chip: python scripts/bench_pallas_scatter.py [M] [T]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
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
    from jax.experimental import pallas as pl

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    val = jax.random.normal(key, (M,), dtype=jnp.float32)

    @jax.jit
    def xla_scatter(idx, v):
        return jnp.zeros((T,), jnp.float32).at[idx].add(v)

    def kernel(idx_ref, val_ref, out_ref):
        # zero the VMEM accumulator once, then serially accumulate the
        # whole contribution stream; the accumulator never leaves VMEM
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            out_ref[idx_ref[i]] += val_ref[i]
            return 0

        jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)

    @jax.jit
    def pallas_scatter(idx, v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T,), jnp.float32),
        )(idx, v)

    t_xla = timeit(xla_scatter, idx, val)
    try:
        out_p = pallas_scatter(idx, val)
        out_x = xla_scatter(idx, val)
        import numpy as np

        err = float(jnp.max(jnp.abs(out_p - out_x)))
        t_pal = timeit(pallas_scatter, idx, val)
        print(f"M={M} T={T} max|err|={err:.3e}")
        print(f"xla HBM scatter-add     {t_xla:8.2f} ms "
              f"({t_xla / M * 1e6:.2f} ns/elem)")
        print(f"pallas VMEM accumulate  {t_pal:8.2f} ms "
              f"({t_pal / M * 1e6:.2f} ns/elem)")
    except Exception as exc:  # noqa: BLE001
        print(f"xla HBM scatter-add     {t_xla:8.2f} ms "
              f"({t_xla / M * 1e6:.2f} ns/elem)")
        print(f"pallas VMEM accumulate  FAILED: {type(exc).__name__}: "
              f"{str(exc)[:400]}")


if __name__ == "__main__":
    main()
