#!/usr/bin/env python
"""Hash-table gradient transpose, round 2: 1-D-only strategies.

Lesson from bench_hash_transpose.py: any materialized (M, 2) array pays
the (8, 128) tile padding (64x write amplification), so every strategy
here uses ONLY 1-D arrays (per-feature) plus the (M,) key array.

  scatter2d   zeros((T, F)).at[idx].add(vals)          XLA baseline
  scatter1d   per-feature zeros((T,)).at[idx].add(v)
  sortseg     argsort -> 1-D permutes -> cumsum -> searchsorted(arange)
              -> gather + adjacent diff            (exact segment sums)

Plus primitive costs: argsort, 1-D permute, searchsorted, 1-D gather with
random vs 50%-adjacent-duplicate indices (the z-pairing question).

Usage: python scripts/bench_hash_transpose2.py [n_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << n_log2
    m = n * 8  # corner contributions of one level
    table_size = 1 << 19
    feats = 2

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/ren_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (m,), 0, table_size, dtype=jnp.int32)
    v0 = jax.random.normal(k2, (m,), jnp.float32)
    v1 = jax.random.normal(jax.random.fold_in(k2, 1), (m,), jnp.float32)
    vals2d = jnp.stack([v0, v1], axis=-1)

    # ---- baselines ----
    scatter2d = jax.jit(
        lambda i, v: jnp.zeros((table_size, feats), v.dtype).at[i].add(v)
    )
    t_s2 = timeit(scatter2d, idx, vals2d)

    scatter1d = jax.jit(lambda i, a, b: (
        jnp.zeros((table_size,), a.dtype).at[i].add(a),
        jnp.zeros((table_size,), b.dtype).at[i].add(b),
    ))
    t_s1 = timeit(scatter1d, idx, v0, v1)
    print(f"scatter2d {t_s2:7.1f} ms   scatter1d(x2) {t_s1:7.1f} ms   "
          f"({m} rows -> {table_size})")

    # ---- primitive costs ----
    t_argsort = timeit(jax.jit(jnp.argsort), idx)
    order = jnp.argsort(idx)
    t_permute = timeit(jax.jit(lambda v, o: v[o]), v0, order)
    t_gather_rand = timeit(jax.jit(lambda t, i: t[i]),
                           jnp.zeros((table_size,)), idx)
    # 50% adjacent duplicates (z-pairing shape): idx[2k+1] = idx[2k]
    idx_dup = jnp.repeat(idx[: m // 2], 2)
    t_gather_dup = timeit(jax.jit(lambda t, i: t[i]),
                          jnp.zeros((table_size,)), idx_dup)
    t_scatter_dup = timeit(scatter1d, idx_dup, v0, v1)
    print(f"argsort {t_argsort:7.1f}   permute1d {t_permute:7.1f}   "
          f"gather1d rand {t_gather_rand:7.1f} / 50%dup "
          f"{t_gather_dup:7.1f}   scatter1d 50%dup {t_scatter_dup:7.1f}")

    # ---- sort-based exact segment sums, 1-D only ----
    def sortseg(i, a, b):
        order = jnp.argsort(i)
        i_s = i[order]
        outs = []
        for v in (a, b):
            csum = jnp.cumsum(v[order])
            # S[r] = total of contributions with key <= r; searchsorted
            # with sorted arange queries
            pos = jnp.searchsorted(
                i_s, jnp.arange(table_size, dtype=i.dtype), side="right"
            )
            s_incl = jnp.where(
                pos > 0, csum[jnp.maximum(pos - 1, 0)], 0.0
            )
            prev = jnp.concatenate([jnp.zeros((1,)), s_incl[:-1]])
            outs.append(s_incl - prev)
        return outs[0], outs[1]

    sortseg_j = jax.jit(sortseg)
    t_sort = timeit(sortseg_j, idx, v0, v1)
    ref0, ref1 = scatter1d(idx, v0, v1)
    got0, got1 = sortseg_j(idx, v0, v1)
    err = max(float(jnp.max(jnp.abs(ref0 - got0))),
              float(jnp.max(jnp.abs(ref1 - got1))))
    print(f"sortseg   {t_sort:7.1f} ms   (max |err| {err:.2e})")

    # variant: one shared searchsorted, reuse across features
    def sortseg_shared(i, a, b):
        order = jnp.argsort(i)
        i_s = i[order]
        pos = jnp.searchsorted(
            i_s, jnp.arange(table_size, dtype=i.dtype), side="right"
        )
        pm1 = jnp.maximum(pos - 1, 0)
        nz = pos > 0
        outs = []
        for v in (a, b):
            csum = jnp.cumsum(v[order])
            s_incl = jnp.where(nz, csum[pm1], 0.0)
            prev = jnp.concatenate([jnp.zeros((1,)), s_incl[:-1]])
            outs.append(s_incl - prev)
        return outs[0], outs[1]

    t_sort_sh = timeit(jax.jit(sortseg_shared), idx, v0, v1)
    print(f"sortseg (shared search) {t_sort_sh:7.1f} ms")

    # ---- 16-sample run-length coherent indices, scatter vs dedup ----
    # coarse level: runs of ~16 consecutive equal indices
    run = 16
    idx_coh = jnp.repeat(
        jax.random.randint(k1, (m // run,), 0, table_size,
                           dtype=jnp.int32), run
    )
    t_scatter_coh = timeit(scatter1d, idx_coh, v0, v1)

    def dedup_scatter(i, a, b):
        is_last = jnp.concatenate([i[1:] != i[:-1], jnp.ones((1,), bool)])
        outs = []
        for v in (a, b):
            csum = jnp.cumsum(v)
            # per-run sum lands at run-last positions; dump the rest on a
            # sacrificial row
            tgt = jnp.where(is_last, i, table_size)
            acc = jnp.zeros((table_size + 1,), v.dtype).at[tgt].add(
                jnp.where(is_last, csum, 0.0)
            )
            # csum makes run sums = diff of consecutive last-csums; undo
            # by subtracting the scatter of the PREVIOUS run's last csum
            prev_csum = jnp.concatenate([jnp.zeros((1,)), csum[:-1]])
            is_first = jnp.concatenate([jnp.ones((1,), bool),
                                        i[1:] != i[:-1]])
            tgt_f = jnp.where(is_first, i, table_size)
            acc = acc.at[tgt_f].add(
                -jnp.where(is_first, prev_csum, 0.0)
            )
            outs.append(acc[:table_size])
        return outs[0], outs[1]

    dedup_j = jax.jit(dedup_scatter)
    t_dedup = timeit(dedup_j, idx_coh, v0, v1)
    r0, r1 = scatter1d(idx_coh, v0, v1)
    d0, d1 = dedup_j(idx_coh, v0, v1)
    errc = max(float(jnp.max(jnp.abs(r0 - d0))),
               float(jnp.max(jnp.abs(r1 - d1))))
    print(f"coherent(run={run}): scatter {t_scatter_coh:7.1f} ms   "
          f"dedup-scatter {t_dedup:7.1f} ms  (max |err| {errc:.2e})")


if __name__ == "__main__":
    main()
