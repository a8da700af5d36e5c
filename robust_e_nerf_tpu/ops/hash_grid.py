"""Multiresolution (hash) grid encoding — XLA implementation.

Replaces the reference's `tcnn.Encoding` (external/ngp.py:166-170; config
surface at configs/train/synthetic.yaml:62-69) with numerically matching
semantics, re-derived from the Instant-NGP paper's published scheme:

  * level l resolution:  scale_l = base_resolution * per_level_scale**l - 1,
    res_l = ceil(scale_l) + 1
  * sample coordinate:   p = x * scale_l + 0.5, corner = floor(p), w = frac(p)
  * per-level storage:   dense strided indexing when the level fits the
    table budget, otherwise the spatial hash
    (x * 1) ^ (y * 2654435761) ^ (z * 805459861)  mod  2**log2_hashmap_size
  * interpolation:       Linear (trilinear) / Smoothstep / Nearest
  * init:                U(-1e-4, 1e-4)

Levels are processed with `lax.scan` over a single flat parameter table so
peak memory stays at one level's gather; the backward pass is XLA's
scatter-add transpose.  `otype` in {HashGrid, DenseGrid, TiledGrid} mirrors
the reference config surface (configs/train/synthetic.yaml:63).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_derivatives import linear_call

_PRIMES = (1, 2654435761, 805459861)


def _gather_rows(table, flat_idx, total_entries, n_features,
                 read_dtype=None):
    """`table[flat_idx]` with a transpose built from per-feature 1-D
    scatter-adds.

    XLA's native transpose of a row gather is a scatter-add of (M, F)
    rows, which on TPU runs ~3.3x slower than F independent 1-D
    scatter-adds at the same contribution count (measured at the ngp
    backward's shapes, scripts/bench_hash_transpose2.py).  `linear_call`
    keeps both forward-mode (the l_grad jvp) and reverse-mode AD intact:
    the jvp of a gather is the same gather on the tangent table.

    `read_dtype` (e.g. jnp.bfloat16) casts the table before the gather
    and casts the gathered rows back, halving the forward's random-read
    traffic; the output, cotangents and the gradient scatter stay in the
    table's dtype (f32 accumulation).  This is an opt-in deviation from
    the reference's forced-fp32 tcnn encoding (external/ngp.py:166-170).
    """

    def gather_fn(idx, tab):
        if read_dtype is not None and tab.dtype != read_dtype:
            return tab.astype(read_dtype)[idx].astype(tab.dtype)
        return tab[idx]

    def gather_transpose(idx, ct):  # ct: idx.shape + (F,)
        flat = idx.reshape(-1)
        cols = [
            jnp.zeros((total_entries,), ct.dtype).at[flat].add(
                ct[..., f].reshape(-1)
            )
            for f in range(n_features)
        ]
        return jnp.stack(cols, axis=-1)

    return linear_call(gather_fn, gather_transpose, flat_idx, table)


@dataclasses.dataclass(frozen=True)
class HashGridMeta:
    """Static metadata of a multiresolution grid encoding."""

    otype: str
    n_levels: int
    n_features_per_level: int
    log2_hashmap_size: int
    base_resolution: int
    per_level_scale: float
    interpolation: str  # Linear | Smoothstep | Nearest
    num_dim: int
    # per-level derived constants
    resolutions: Tuple[int, ...]
    sizes: Tuple[int, ...]
    offsets: Tuple[int, ...]
    hashed: Tuple[bool, ...]
    total_entries: int
    # opt-in: cast table reads to this dtype on the encode forward
    # (gradient accumulation stays in the table dtype); "float32" =
    # reference-exact (tcnn forced-fp32, external/ngp.py:166-170)
    table_read_dtype: str = "float32"

    @property
    def output_dim(self):
        return self.n_levels * self.n_features_per_level


def build_meta(pos_encoding_config, num_dim=3) -> HashGridMeta:
    cfg = dict(pos_encoding_config)
    otype = cfg.get("otype", "HashGrid")
    assert otype in ("HashGrid", "DenseGrid", "TiledGrid")
    n_levels = int(cfg["n_levels"])
    n_features = int(cfg["n_features_per_level"])
    log2_hashmap_size = int(cfg.get("log2_hashmap_size", 19))
    base_resolution = int(cfg["base_resolution"])
    per_level_scale = float(cfg["per_level_scale"])
    interpolation = cfg.get("interpolation", "Linear")
    assert interpolation in ("Linear", "Smoothstep", "Nearest")

    hashmap_size = 1 << log2_hashmap_size
    resolutions, sizes, offsets, hashed = [], [], [], []
    offset = 0
    for level in range(n_levels):
        scale = base_resolution * per_level_scale**level - 1.0
        res = int(math.ceil(scale)) + 1
        dense_entries = res**num_dim
        # round dense storage up to a multiple of 8 (tcnn alignment)
        dense_entries_aligned = -(-dense_entries // 8) * 8
        if otype == "DenseGrid":
            size = dense_entries_aligned
            use_hash = False
        elif otype == "TiledGrid":
            size = min(dense_entries_aligned, hashmap_size)
            use_hash = False
        else:  # HashGrid
            if dense_entries_aligned <= hashmap_size:
                size = dense_entries_aligned
                use_hash = False
            else:
                size = hashmap_size
                use_hash = True
        resolutions.append(res)
        sizes.append(size)
        offsets.append(offset)
        hashed.append(use_hash)
        offset += size

    return HashGridMeta(
        otype=otype,
        n_levels=n_levels,
        n_features_per_level=n_features,
        log2_hashmap_size=log2_hashmap_size,
        base_resolution=base_resolution,
        per_level_scale=per_level_scale,
        interpolation=interpolation,
        num_dim=num_dim,
        resolutions=tuple(resolutions),
        sizes=tuple(sizes),
        offsets=tuple(offsets),
        hashed=tuple(hashed),
        total_entries=offset,
        table_read_dtype=str(cfg.get("table_read_dtype", "float32")),
    )


def init_table(key, meta: HashGridMeta, dtype=jnp.float32):
    """U(-1e-4, 1e-4) initialization, as in tiny-cuda-nn's grid encoding."""
    return jax.random.uniform(
        key,
        (meta.total_entries, meta.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _resolve_read_dtype(meta):
    if meta.table_read_dtype in (None, "float32"):
        return None
    return jnp.dtype(meta.table_read_dtype)


def _corner_offsets(num_dim):
    """(2**D, D) array of corner displacement bits."""
    corners = np.stack(
        np.meshgrid(*([np.arange(2)] * num_dim), indexing="ij"), axis=-1
    ).reshape(-1, num_dim)
    return jnp.asarray(corners, dtype=jnp.uint32)


def _level_indices(corner_coords, resolution, size, use_hash, tiled):
    """Flat table index of integer corner coords (..., D) for one level.

    All arithmetic in uint32 with natural wraparound; for hashed levels the
    strided index is unused so its overflow is harmless.
    """
    num_dim = corner_coords.shape[-1]
    stride_index = jnp.zeros(corner_coords.shape[:-1], dtype=jnp.uint32)
    stride = jnp.uint32(1)
    for d in range(num_dim):
        stride_index = stride_index + corner_coords[..., d] * stride
        stride = stride * resolution.astype(jnp.uint32)
    hash_index = jnp.zeros_like(stride_index)
    for d in range(num_dim):
        hash_index = hash_index ^ (
            corner_coords[..., d] * jnp.uint32(_PRIMES[d])
        )
    index = jnp.where(use_hash, hash_index, stride_index)
    if tiled:
        index = index % size.astype(jnp.uint32)
    else:
        # hashed level sizes are powers of two -> mask; dense indices are
        # already < size
        index = jnp.where(
            use_hash, index & (size.astype(jnp.uint32) - 1), index
        )
    return index


def _packed_dense_level(table, x, meta: HashGridMeta, level):
    """One dense level's features via the flat-shift footprint pack.

    For a dense (strided) level, corner (dx, dy, dz) sits at flat offset
    s = dx + dy*res + dz*res**2 from the base corner — including the
    out-of-range wraparound cases, which the flat strided arithmetic maps
    to exactly the same rows the per-corner gather would read.  So the
    8-corner footprint table is 8 *slices* of the flat parameter table
    (streaming copies; the transpose is 8 slice-adds), and each sample
    needs ONE gathered (8*F)-wide row instead of 8 F-wide rows.  TPU row
    gathers are priced per row nearly independent of width
    (docs/PERFORMANCE.md), so this is ~8x cheaper on both the encode
    gather and the table-gradient scatter for dense levels.  Bit-exact
    with the per-corner path (same rows, same weights) for in-range and
    boundary positions; positions far outside [0, 1] (base index beyond
    res^D) clamp to the last row here but wrap through strided arithmetic
    in the scan path — harmless, because the field's selector zeroes
    out-of-aabb densities downstream (ngp.py:238,249).
    """
    res = meta.resolutions[level]
    offset = meta.offsets[level]
    scale = meta.base_resolution * meta.per_level_scale**level - 1.0
    corners = _corner_offsets(meta.num_dim)
    num_corners = corners.shape[0]
    n = x.shape[0]

    p = x * jnp.asarray(scale, x.dtype) + 0.5
    p0 = jnp.floor(p)
    w = p - p0
    if meta.interpolation == "Smoothstep":
        w = w * w * (3.0 - 2.0 * w)
    p0 = jnp.clip(p0, 0.0, None).astype(jnp.uint32)

    base_idx = jnp.zeros((n,), dtype=jnp.uint32)
    stride = 1
    for d in range(meta.num_dim):
        base_idx = base_idx + p0[:, d] * jnp.uint32(stride)
        stride *= res

    num_rows = res**meta.num_dim
    corners_np = np.stack(
        np.meshgrid(*([np.arange(2)] * meta.num_dim), indexing="ij"),
        axis=-1,
    ).reshape(-1, meta.num_dim)
    shifts = [
        int(sum(int(c) * res**d for d, c in enumerate(corner)))
        for corner in corners_np
    ]
    footprint = jnp.concatenate(
        [
            jax.lax.dynamic_slice_in_dim(table, offset + s, num_rows, 0)
            for s in shifts
        ],
        axis=-1,
    )  # (res**3, C*F)
    rows = footprint[
        jnp.clip(base_idx, 0, num_rows - 1).astype(jnp.int32)
    ].reshape(n, num_corners, meta.n_features_per_level)

    corner_f = corners.astype(x.dtype)
    weights = jnp.prod(
        corner_f[None] * w[:, None, :]
        + (1.0 - corner_f[None]) * (1.0 - w[:, None, :]),
        axis=-1,
    )  # (N, C)
    return jnp.einsum(
        "nc,ncf->nf", weights, rows, preferred_element_type=table.dtype
    )


def encode(table, x, meta: HashGridMeta):
    """Encode positions x (..., D) in [0, 1]^D -> (..., L * F) features.

    Out-of-range positions still produce features (the field's `selector`
    zeroes out-of-bounds densities downstream, ngp.py:238,249).

    Dense (non-hashed) Linear/Smoothstep levels take the packed-footprint
    fast path (`_packed_dense_level`); hashed levels scan with per-corner
    gathers (their corner rows are spatially unrelated, so no packing is
    possible without changing the hash scheme).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, meta.num_dim)
    n = x.shape[0]
    corners = _corner_offsets(meta.num_dim)  # (C, D) uint32
    num_corners = corners.shape[0]

    tiled = meta.otype == "TiledGrid"
    interpolation = meta.interpolation

    packed_levels = []
    if interpolation in ("Linear", "Smoothstep") and not tiled:
        packed_levels = [
            l for l in range(meta.n_levels)
            if not meta.hashed[l]
            # base+shift slices must stay inside the table: the slice for
            # the top corner spans [offset + s_max, offset + s_max + res^3)
            and meta.offsets[l] + meta.resolutions[l] ** meta.num_dim
            + sum(meta.resolutions[l] ** d for d in range(meta.num_dim))
            <= meta.total_entries
        ]
    scan_levels = [
        l for l in range(meta.n_levels) if l not in packed_levels
    ]

    level_scale = jnp.asarray(
        [meta.base_resolution * meta.per_level_scale**l - 1.0
         for l in scan_levels],
        dtype=x.dtype,
    )
    level_res = jnp.asarray(
        [meta.resolutions[l] for l in scan_levels], dtype=jnp.uint32
    )
    level_size = jnp.asarray(
        [meta.sizes[l] for l in scan_levels], dtype=jnp.uint32
    )
    level_offset = jnp.asarray(
        [meta.offsets[l] for l in scan_levels], dtype=jnp.uint32
    )
    level_hashed = jnp.asarray([meta.hashed[l] for l in scan_levels])

    def level_features_x(table, x, level_consts):
        scale, res, size, offset, use_hash = level_consts
        p = x * scale + 0.5
        p0 = jnp.floor(p)
        w = p - p0
        p0 = jnp.clip(p0, 0.0, None).astype(jnp.uint32)
        if interpolation == "Nearest":
            corner_coords = p0 + (w > 0.5).astype(jnp.uint32)  # (N, D)
            idx = _level_indices(corner_coords, res, size, use_hash, tiled)
            feats = _gather_rows(
                table, (offset + idx).astype(jnp.int32),
                meta.total_entries, meta.n_features_per_level,
                read_dtype=_resolve_read_dtype(meta),
            )
        else:
            if interpolation == "Smoothstep":
                w = w * w * (3.0 - 2.0 * w)
            corner_coords = p0[:, None, :] + corners[None, :, :]  # (N, C, D)
            idx = _level_indices(corner_coords, res, size, use_hash, tiled)
            gathered = _gather_rows(
                table, (offset + idx).astype(jnp.int32),
                meta.total_entries, meta.n_features_per_level,
                read_dtype=_resolve_read_dtype(meta),
            )  # (N, C, F)
            corner_f = corners.astype(x.dtype)  # (C, D)
            weights = jnp.prod(
                corner_f[None] * w[:, None, :]
                + (1.0 - corner_f[None]) * (1.0 - w[:, None, :]),
                axis=-1,
            )  # (N, C)
            feats = jnp.einsum(
                "nc,ncf->nf", weights, gathered,
                preferred_element_type=table.dtype,
            )
        return feats

    features = [None] * meta.n_levels
    for level in packed_levels:
        # checkpoint for the same reason as the scan body below: the
        # gathered (N, 8, F) rows would otherwise be backward residuals
        packed_fn = jax.checkpoint(
            lambda t, xx, l=level: _packed_dense_level(t, xx, meta, l)
        )
        features[level] = packed_fn(table, x)

    if scan_levels:
        import os

        # Unrolling the levels lets XLA overlap their latency-bound
        # gathers/scatters (~4% step win at 2^18) but makes each level's
        # 16x-padded (N, 8, 3) corner-coords temp live concurrently —
        # 1.9 GB each at the 2^20 budget, a compile-time OOM.  The scan
        # serializes the temps, so auto-select by N; REN_HASH_UNROLL=0/1
        # overrides.
        unroll_env = os.environ.get("REN_HASH_UNROLL")
        if unroll_env is not None:
            unroll = unroll_env != "0"
        else:
            unroll = n <= (1 << 19)
        if unroll:
            # Unrolled per-level loop (still checkpointed per level, so
            # backward memory stays at one level's working set): unlike
            # lax.scan, the unrolled graph lets XLA overlap the
            # latency-bound corner gathers/scatters of different levels.
            # Per-level static constants (plain Python numbers) also save
            # the in-graph const indexing the scan needs.
            for level in scan_levels:
                consts = (
                    np.float32(
                        meta.base_resolution
                        * meta.per_level_scale**level - 1.0
                    ),
                    np.uint32(meta.resolutions[level]),
                    np.uint32(meta.sizes[level]),
                    np.uint32(meta.offsets[level]),
                    bool(meta.hashed[level]),
                )
                # consts bound statically (lambda default) so the level's
                # resolution/size/offset/hashed fold into the compiled
                # graph instead of being traced scalars
                fn = jax.checkpoint(
                    lambda tab, xx, c=consts: level_features_x(tab, xx, c)
                )
                features[level] = fn(table, x)
        else:
            # checkpoint the level body: the scan would otherwise stack
            # every level's corner gathers/weights as (L, N, 8[, F])
            # backward residuals (10+ GB at megasample budgets);
            # recomputing each level's gathers in the backward scan keeps
            # peak memory at one level's working set
            _, per_level = jax.lax.scan(
                jax.checkpoint(
                    lambda carry, consts: (
                        carry, level_features_x(table, x, consts)
                    )
                ),
                None,
                (level_scale, level_res, level_size, level_offset,
                 level_hashed),
            )  # (L', N, F)
            for i, level in enumerate(scan_levels):
                features[level] = per_level[i]

    out = jnp.concatenate(features, axis=-1)
    del num_corners
    return out.reshape(*batch_shape, meta.output_dim)


def encode_batched(table, x, meta: HashGridMeta):
    """`encode` with ALL levels' corner gathers fused into one flat gather.

    The lax.scan variant issues L sequential (N, 8)-row gathers; fusing
    them into a single (N, L*8)-row gather lets the memory system overlap
    the random accesses across levels (same values, same table layout).
    Linear interpolation only.
    """
    assert meta.interpolation == "Linear"
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, meta.num_dim)
    n = x.shape[0]
    corners = _corner_offsets(meta.num_dim)  # (C, D) uint32
    num_corners = corners.shape[0]
    num_levels = meta.n_levels

    level_scale = jnp.asarray(
        [meta.base_resolution * meta.per_level_scale**l - 1.0
         for l in range(num_levels)],
        dtype=x.dtype,
    )
    level_res = jnp.asarray(meta.resolutions, dtype=jnp.uint32)
    level_size = jnp.asarray(meta.sizes, dtype=jnp.uint32)
    level_offset = jnp.asarray(meta.offsets, dtype=jnp.uint32)
    level_hashed = jnp.asarray(meta.hashed)
    tiled = meta.otype == "TiledGrid"

    p = x[:, None, :] * level_scale[None, :, None] + 0.5   # (N, L, D)
    p0 = jnp.floor(p)
    w = p - p0                                              # (N, L, D)
    p0 = jnp.clip(p0, 0.0, None).astype(jnp.uint32)
    # (N, L, C, D) corner coordinates
    corner_coords = p0[:, :, None, :] + corners[None, None, :, :]
    idx = _level_indices(
        corner_coords,
        level_res[None, :, None],
        level_size[None, :, None],
        level_hashed[None, :, None],
        tiled,
    )                                                       # (N, L, C)
    flat_idx = (level_offset[None, :, None] + idx).astype(jnp.int32)
    gathered = _gather_rows(
        table, flat_idx.reshape(n, num_levels * num_corners),
        meta.total_entries, meta.n_features_per_level,
        read_dtype=_resolve_read_dtype(meta),
    )
    gathered = gathered.reshape(
        n, num_levels, num_corners, meta.n_features_per_level
    )
    corner_f = corners.astype(x.dtype)                      # (C, D)
    weights = jnp.prod(
        corner_f[None, None] * w[:, :, None, :]
        + (1.0 - corner_f[None, None]) * (1.0 - w[:, :, None, :]),
        axis=-1,
    )                                                       # (N, L, C)
    feats = jnp.einsum(
        "nlc,nlcf->nlf", weights, gathered.astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    out = feats.reshape(n, meta.output_dim)
    return out.reshape(*batch_shape, meta.output_dim)
