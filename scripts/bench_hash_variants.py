#!/usr/bin/env python
"""Micro-benchmark: hash-grid encode variants on real hardware.

Variants:
  scan      — current lax.scan over levels (one level's gather at a time)
  batched   — all levels' corner indices in ONE flat gather
  bf16      — batched with a bfloat16 table
Each timed fwd and fwd+bwd (table gradient) at the training capacity.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=6, warmup=2):
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
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/ren_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from robust_e_nerf_tpu.ops import hash_grid

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 327680
    meta = hash_grid.build_meta({
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.4472692012786865, "interpolation": "Linear",
    })
    key = jax.random.PRNGKey(0)
    table = hash_grid.init_table(key, meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (K, 3))
    print(f"K={K} levels={meta.n_levels} total_entries={meta.total_entries}")

    def run(encode_fn, tab):
        fwd = jax.jit(lambda t, x: encode_fn(t, x, meta))
        t_fwd = timeit(fwd, tab, x)

        def loss(t, x):
            return jnp.sum(encode_fn(t, x, meta))

        bwd = jax.jit(jax.grad(loss))
        t_bwd = timeit(bwd, tab, x)
        return t_fwd, t_bwd

    t_fwd, t_bwd = run(hash_grid.encode, table)
    print(f"scan     fwd {t_fwd:7.1f} ms   f+b {t_bwd:7.1f} ms")

    t_fwd, t_bwd = run(hash_grid.encode_batched, table)
    print(f"batched  fwd {t_fwd:7.1f} ms   f+b {t_bwd:7.1f} ms")

    t_fwd, t_bwd = run(hash_grid.encode_batched, table.astype(jnp.bfloat16))
    print(f"bf16     fwd {t_fwd:7.1f} ms   f+b {t_bwd:7.1f} ms")


if __name__ == "__main__":
    main()
