#!/usr/bin/env python
"""Price the run-length-dedup rewrite of the hash-table gradient scatter.

The ngp backward's floor is the per-level table scatter-add
(docs/PERFORMANCE.md round-3): N~2.1M contributions x 8 corners at
~9 ns/element.  Ray-coherent marching makes consecutive samples share
cells at coarse levels, so per corner column the index stream has runs of
duplicates; a segmented-sum over runs (streams + sorted-index ops) could
replace the random scatter with one ~0.5-0.75N-row scatter.

Whether that wins hinges on two unmeasured prices:
  1. gather at ASCENDING (sorted) indices vs random
  2. scatter-add at ASCENDING indices vs random
This script measures both, plus the end-to-end dedup pipeline vs the
plain per-feature 1-D scatter baseline at the ngp level shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )

    N = int(float(os.environ.get("N", 1 << 21)))  # contributions per corner
    T = 1 << 19                                   # table rows
    rng = np.random.default_rng(0)

    # random indices (the current scatter's access pattern)
    idx_rand = rng.integers(0, T, size=N, dtype=np.int32)
    # run-length-duplicated indices: mean run ~2 (coarse hashed level)
    runs = rng.integers(0, T, size=N, dtype=np.int32)
    rep = rng.choice([1, 2, 3], size=N, p=[0.35, 0.45, 0.2])
    idx_runs = np.repeat(runs, rep)[:N].astype(np.int32)
    # sorted indices (best case for locality)
    idx_sorted = np.sort(idx_rand).astype(np.int32)

    vals = jnp.asarray(rng.standard_normal(N), jnp.float32)
    table = jnp.asarray(rng.standard_normal((T,)), jnp.float32)

    scatter = jax.jit(
        lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(v)
    )
    gather = jax.jit(lambda i, t: t[i])

    for name, idx in (("random", idx_rand), ("runs~2", idx_runs),
                      ("sorted", idx_sorted)):
        i = jnp.asarray(idx)
        ms_s = timeit(scatter, i, vals)
        ms_g = timeit(gather, i, table)
        print(f"{name:8s} scatter {ms_s:7.2f} ms ({ms_s*1e6/N:.2f} ns/row)"
              f"   gather {ms_g:7.2f} ms ({ms_g*1e6/N:.2f} ns/row)")

    # end-to-end: dedup pipeline vs plain scatter on the runs~2 stream.
    # R_cap is a static 0.75N; overflow would fall back (not benched).
    R_cap = int(N * 0.75)
    i_runs = jnp.asarray(idx_runs)

    def dedup_scatter(idx, v):
        boundary = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (idx[1:] != idx[:-1]).astype(jnp.int32)]
        )
        n = idx.shape[0]
        run_id = jnp.cumsum(boundary) - 1              # sorted, [0, R)
        n_runs = run_id[-1] + 1
        live = jnp.arange(R_cap) < n_runs
        csum = jnp.cumsum(v)
        # head positions of each run (scatter at sorted run_id); dead
        # slots -> n so the last live run's "next head" lands at the end
        head = jnp.zeros((R_cap,), jnp.int32).at[
            jnp.minimum(run_id, R_cap - 1)
        ].max(jnp.arange(n, dtype=jnp.int32) * boundary)
        head = jnp.where(live, head, n)
        # run sums via boundary gathers of the global cumsum:
        # seg[r] = csum[next_head - 1] - csum[head - 1]
        nxt = jnp.concatenate([head[1:], jnp.full((1,), n, jnp.int32)])
        seg = csum[jnp.clip(nxt - 1, 0, n - 1)] - jnp.where(
            head > 0, csum[jnp.clip(head - 1, 0, n - 1)], 0.0
        )
        ti = idx[jnp.minimum(head, n - 1)]
        ti = jnp.where(live, ti, T - 1)
        seg = jnp.where(live, seg, 0.0)
        return jnp.zeros((T,), jnp.float32).at[ti].add(seg)

    dedup_jit = jax.jit(dedup_scatter)
    base = jax.device_get(scatter(i_runs, vals))
    test = jax.device_get(dedup_jit(i_runs, vals))
    err = np.abs(base - test).max()
    ms_plain = timeit(scatter, i_runs, vals)
    ms_dedup = timeit(dedup_jit, i_runs, vals)
    print(f"plain scatter  {ms_plain:7.2f} ms | dedup pipeline "
          f"{ms_dedup:7.2f} ms | max err {err:.2e}")


if __name__ == "__main__":
    main()
