#!/usr/bin/env python
"""Scatter-add cost vs row width: one W-wide row scatter vs W 1-D scatters.

Informs whether the per-feature 1-D transpose trick (ops/hash_grid.py
`_gather_rows`, 3.3x at W=2) also pays at the packed-dense level's W=16
and the VM plane's W=4*n_comp.

Usage: python scripts/bench_scatter_width.py [m_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n * 1000.0


def main():
    m_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    m = 1 << m_log2
    table_size = 1 << 18

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/ren_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (m,), 0, table_size, dtype=jnp.int32)

    for width in (2, 4, 16, 64):
        vals = jax.random.normal(jax.random.fold_in(key, width),
                                 (m, width), jnp.float32)
        wide = jax.jit(
            lambda i, v, w=width: jnp.zeros(
                (table_size, w), v.dtype).at[i].add(v)
        )
        t_wide = timeit(wide, idx, vals)

        def split(i, v, w=width):
            return [
                jnp.zeros((table_size,), v.dtype).at[i].add(v[:, f])
                for f in range(w)
            ]

        t_split = timeit(jax.jit(split), idx, vals)
        print(f"width {width:3d}: wide-row {t_wide:7.1f} ms   "
              f"{width}x 1-D {t_split:7.1f} ms   ({m} rows)")


if __name__ == "__main__":
    main()
