#!/usr/bin/env python
"""Microbenchmark: hash-grid table-gradient transpose strategies at the
reference ngp@2^20 workload shapes (VERDICT round-2 item #2).

Per training render the backward pass must accumulate, for each hashed
level, N*8 corner contributions (N ~= 1.05M samples) into a 2^19-row
feature table.  Strategies compared on real hardware:

  scatter   zeros.at[idx].add(vals)                      (XLA baseline)
  sort      argsort(idx) -> permute vals -> segment-sum via blocked cumsum
            -> one scatter of run boundaries
  runlen    pre-combine consecutive equal indices (ray-coherent samples
            share corner cells at coarse levels), then scatter
  fused     one sort over ALL hashed levels' keys at once

Also: f32 vs bf16 gather forward cost at the same shapes.

Usage: python scripts/bench_hash_transpose.py [n_log2] [n_levels]
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


def make_indices(key, n, table_size, coherence_cells):
    """Corner indices with ray-like spatial coherence: consecutive samples
    advance through `coherence_cells` distinct cells over the batch."""
    base = (jnp.arange(n) * coherence_cells // n).astype(jnp.uint32)
    jitter = jax.random.randint(key, (n, 8), 0, 1 << 16).astype(jnp.uint32)
    idx = (base[:, None] * jnp.uint32(2654435761) ^ jitter) & jnp.uint32(
        table_size - 1
    )
    return idx.reshape(-1).astype(jnp.int32)


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << n_log2
    table_size = 1 << 19
    feats = 2

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/ren_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # one fine level: no coherence (cells ~ sample spacing)
    idx_fine = make_indices(k1, n, table_size, coherence_cells=n)
    vals = jax.random.normal(k2, (n * 8, feats), jnp.float32)
    table = jax.random.normal(k3, (table_size, feats), jnp.float32)

    # ---- forward gather f32 vs bf16 ----
    gather = jax.jit(lambda t, i: t[i])
    t_gather_f32 = timeit(gather, table, idx_fine)
    t_gather_bf16 = timeit(gather, table.astype(jnp.bfloat16), idx_fine)
    print(f"gather {n*8} rows: f32 {t_gather_f32:.1f} ms   "
          f"bf16 {t_gather_bf16:.1f} ms")

    # ---- scatter baseline ----
    scatter = jax.jit(
        lambda i, v: jnp.zeros((table_size, feats), v.dtype).at[i].add(v)
    )
    t_scatter = timeit(scatter, idx_fine, vals)
    print(f"scatter-add {n*8} rows -> {table_size}: {t_scatter:.1f} ms")

    # ---- sort-based segment sum ----
    def sort_transpose(i, v):
        order = jnp.argsort(i)
        i_s = i[order]
        v_s = v[order]
        csum = jnp.cumsum(v_s, axis=0)
        # run boundaries: last occurrence of each index value
        is_last = jnp.concatenate(
            [i_s[1:] != i_s[:-1], jnp.ones((1,), bool)]
        )
        # exclusive prefix at the PREVIOUS boundary via segment trick:
        # scatter csum at last-occurrence rows, take adjacent differences
        # after gathering per unique index
        out = jnp.zeros((table_size + 1, feats), v.dtype)
        # scatter inclusive csum to idx+1, scatter of run starts handled by
        # subtracting the previous run's inclusive csum
        out = out.at[jnp.where(is_last, i_s + 1, table_size)].max(
            jnp.where(is_last[:, None], csum, -jnp.inf)
        )
        # rows never written stay 0 / -inf; fix by forward max-scan
        filled = jax.lax.cummax(
            jnp.where(jnp.isneginf(out), -jnp.inf, out), axis=0
        )
        filled = jnp.where(jnp.isneginf(filled), 0.0, filled)
        return filled[1:] - filled[:-1]

    # NOTE: cummax trick is wrong for general values (csum not monotone);
    # used only to measure the cost shape. The real implementation scatters
    # boundary csums then gathers prev-boundary per unique row.
    def sort_transpose_real(i, v):
        order = jnp.argsort(i)
        i_s = i[order]
        v_s = v[order]
        csum = jnp.cumsum(v_s, axis=0)
        is_last = jnp.concatenate(
            [i_s[1:] != i_s[:-1], jnp.ones((1,), bool)]
        )
        # inclusive csum at each run's end, scattered to its table row
        ends = jnp.zeros((table_size, feats), v.dtype).at[
            jnp.where(is_last, i_s, table_size - 1)
        ].add(jnp.where(is_last[:, None], csum, 0.0))
        # exclusive: csum at previous run's end = ends of all rows < r,
        # cumulative over rows
        run_prefix = jnp.cumsum(ends, axis=0)
        prev = jnp.concatenate(
            [jnp.zeros((1, feats), v.dtype), run_prefix[:-1]], axis=0
        )
        return run_prefix - prev

    sort_j = jax.jit(sort_transpose_real)
    t_sort = timeit(sort_j, idx_fine, vals)
    ref = scatter(idx_fine, vals)
    got = sort_j(idx_fine, vals)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"sort-transpose {n*8} rows: {t_sort:.1f} ms  (max |err| {err:.2e})")

    # ---- run-length pre-combining (coherent mid level) ----
    res_mid = 308  # a mid level: ~2 consecutive samples share cells
    idx_mid = make_indices(k1, n, table_size,
                           coherence_cells=min(n, res_mid * 600))
    # reshape to (N, 8): combine along samples for each corner slot
    def runlen_scatter(i_flat, v):
        i2 = i_flat.reshape(n, 8)
        v2 = v.reshape(n, 8, feats)
        same = jnp.concatenate(
            [jnp.zeros((1, 8), bool), i2[1:] == i2[:-1]], axis=0
        )
        # segment csum over consecutive-equal runs, per corner slot
        csum = jnp.cumsum(v2, axis=0)
        is_last = jnp.concatenate([~same[1:], jnp.ones((1, 8), bool)],
                                  axis=0)
        # scatter only run-last rows with (csum - csum at prev run end)
        prev_end = jnp.where(same, 0, 1)  # placeholder cost shape
        combined = jnp.where(is_last[..., None], csum, 0.0)
        tgt = jnp.where(is_last, i2, table_size - 1)
        return jnp.zeros((table_size, feats), v.dtype).at[
            tgt.reshape(-1)
        ].add(combined.reshape(-1, feats)), prev_end

    runlen_j = jax.jit(runlen_scatter)
    t_runlen = timeit(runlen_j, idx_mid, vals)
    t_scatter_mid = timeit(scatter, idx_mid, vals)
    frac_last = float(jnp.mean(jnp.concatenate(
        [(idx_mid.reshape(n, 8)[1:] != idx_mid.reshape(n, 8)[:-1]),
         jnp.ones((1, 8), bool)], axis=0).astype(jnp.float32)))
    print(f"mid-level scatter {t_scatter_mid:.1f} ms vs runlen-combined "
          f"{t_runlen:.1f} ms (run-last fraction {frac_last:.2f}; cost "
          f"shape only, prefix arithmetic elided)")

    # ---- fused multi-level sort ----
    n_hashed = 11
    keys = jnp.concatenate([
        (idx_fine.astype(jnp.uint32) + jnp.uint32(l * table_size)).astype(
            jnp.int32)
        for l in range(n_hashed)
    ])
    vals_all = jnp.tile(vals, (n_hashed, 1))

    def fused_sort(i, v):
        order = jnp.argsort(i)
        return i[order], v[order]

    fused_j = jax.jit(fused_sort)
    t_fused = timeit(fused_j, keys, vals_all, n=2)
    print(f"fused sort+permute {n_hashed} levels x {n*8} rows: "
          f"{t_fused:.1f} ms "
          f"(vs {n_hashed}x scatter = {n_hashed * t_scatter:.0f} ms)")


if __name__ == "__main__":
    main()
