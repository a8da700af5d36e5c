"""Vector-Matrix (VM) factorized feature grid — the TPU-native field encoding.

Rationale (measured on TPU v5e, see BASELINE.md): random memory access costs
~7ns per gathered row and ~70ns per scattered row *regardless of row width*
(rows are padded to 128 lanes).  The Instant-NGP hash grid needs
16 levels x 8 corners = 128 narrow rows per sample; a VM decomposition
(TensoRF, ECCV 2022 — public method) needs 3 planes x 4 corners +
3 lines x 2 = 18 rows per sample with *wide* feature rows, cutting both the
gather and the gradient-scatter volume ~7x at comparable model capacity.

Encoding of x in [0,1]^3:
    feat_k = bilinear(plane_k, proj_plane_k(x)) * linear(line_k, proj_line_k(x))
    out    = concat_k feat_k           (3 * n_components channels)
with (plane, line) projections ((x,y), z), ((x,z), y), ((y,z), x).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# (plane axes, line axis) per component
_PROJECTIONS = (((0, 1), 2), ((0, 2), 1), ((1, 2), 0))


@dataclasses.dataclass(frozen=True)
class VMGridMeta:
    resolution: int        # plane resolution R (R x R per plane)
    line_resolution: int   # line resolution L
    n_components: int      # feature channels per plane/line pair
    num_dim: int = 3

    @property
    def output_dim(self):
        return len(_PROJECTIONS) * self.n_components


def build_meta(cfg, num_dim=3) -> VMGridMeta:
    assert num_dim == 3
    return VMGridMeta(
        resolution=int(cfg["resolution"]),
        line_resolution=int(cfg.get("line_resolution", cfg["resolution"])),
        n_components=int(cfg["n_components"]),
    )


def init_params(key, meta: VMGridMeta, scale=0.1, dtype=jnp.float32):
    """0.1 * N(0, 1) init as in the TensoRF paper; lines start near 1 so
    the initial plane*line product is non-degenerate."""
    k_planes, k_lines = jax.random.split(key)
    planes = scale * jax.random.normal(
        k_planes,
        (len(_PROJECTIONS), meta.resolution * meta.resolution,
         meta.n_components),
        dtype=dtype,
    )
    lines = 1.0 + scale * jax.random.normal(
        k_lines,
        (len(_PROJECTIONS), meta.line_resolution, meta.n_components),
        dtype=dtype,
    )
    return {"planes": planes, "lines": lines}


def _interp_1d(table, coord, resolution):
    """Linear interpolation of (T, C) rows at coord in [0, 1], (N,) -> (N, C).

    Grid convention matches the hash grid's: p = x * (res - 1), corners at
    floor/ceil.
    """
    p = coord * (resolution - 1)
    p0 = jnp.clip(jnp.floor(p), 0, resolution - 2)
    w = (p - p0)[:, None]
    i0 = p0.astype(jnp.int32)
    v0 = table[i0]
    v1 = table[i0 + 1]
    return v0 * (1.0 - w) + v1 * w


def _interp_2d(table, u, v, resolution):
    """Bilinear interpolation of a flattened (R*R, C) plane at (u, v) in
    [0, 1]^2, (N,) each -> (N, C)."""
    pu = u * (resolution - 1)
    pv = v * (resolution - 1)
    u0 = jnp.clip(jnp.floor(pu), 0, resolution - 2)
    v0 = jnp.clip(jnp.floor(pv), 0, resolution - 2)
    wu = (pu - u0)[:, None]
    wv = (pv - v0)[:, None]
    iu = u0.astype(jnp.int32)
    iv = v0.astype(jnp.int32)
    base = iu * resolution + iv
    # v-corners are adjacent rows -> friendly access pattern
    v00 = table[base]
    v01 = table[base + 1]
    v10 = table[base + resolution]
    v11 = table[base + resolution + 1]
    return (
        v00 * (1 - wu) * (1 - wv)
        + v01 * (1 - wu) * wv
        + v10 * wu * (1 - wv)
        + v11 * wu * wv
    )


def _pair_rows(table):
    """(T, C) -> (T, 2C) where row r = concat(table[r], table[r+1]).

    Random access on TPU is priced per *row* (~7-16 ns regardless of row
    width, docs/PERFORMANCE.md), so packing each row with its successor
    lets every (r, r+1) corner pair cost ONE gather instead of two — and
    the gradient scatter row count halves the same way.  The packing
    itself is a sequential-stream copy (bandwidth-bound, ~free), built
    fresh per call so autodiff folds the duplicate gradients back into the
    base table with one shifted add.
    """
    shifted = jnp.concatenate([table[1:], table[-1:]], axis=0)
    return jnp.concatenate([table, shifted], axis=-1)


def _quad_rows(table, resolution):
    """(R*R, C) plane -> (R*R, 4C) where row r packs the full bilinear
    footprint [r, r+1, r+R, r+R+1].

    4x storage (rebuilt per call as stream copies, ~free) buys ONE gathered
    row per plane per sample instead of four; valid bases (iu, iv <= R-2)
    never touch the shifted tails.  Autodiff folds the four gradient
    slices back into the base table with shifted adds.
    """
    down = jnp.concatenate([table[1:], table[-1:]], axis=0)
    right = jnp.concatenate(
        [table[resolution:], table[-resolution:]], axis=0
    )
    right_down = jnp.concatenate(
        [down[resolution:], down[-resolution:]], axis=0
    )
    return jnp.concatenate([table, down, right, right_down], axis=-1)


def _interp_2d_quad(quad_table, u, v, resolution, n_comp):
    """Bilinear interpolation from a quad-packed plane: 1 gather/sample."""
    pu = u * (resolution - 1)
    pv = v * (resolution - 1)
    u0 = jnp.clip(jnp.floor(pu), 0, resolution - 2)
    v0 = jnp.clip(jnp.floor(pv), 0, resolution - 2)
    wu = (pu - u0)[:, None]
    wv = (pv - v0)[:, None]
    iu = u0.astype(jnp.int32)
    iv = v0.astype(jnp.int32)
    base = iu * resolution + iv
    q = quad_table[base]                       # [v00 | v01 | v10 | v11]
    v00 = q[:, 0 * n_comp:1 * n_comp]
    v01 = q[:, 1 * n_comp:2 * n_comp]
    v10 = q[:, 2 * n_comp:3 * n_comp]
    v11 = q[:, 3 * n_comp:4 * n_comp]
    row0 = v00 * (1 - wv) + v01 * wv
    row1 = v10 * (1 - wv) + v11 * wv
    return row0 * (1 - wu) + row1 * wu


def _interp_1d_paired(pair_table, coord, resolution, n_comp):
    """Linear interpolation from a row-paired line: 1 gather/sample."""
    p = coord * (resolution - 1)
    p0 = jnp.clip(jnp.floor(p), 0, resolution - 2)
    w = (p - p0)[:, None]
    i0 = p0.astype(jnp.int32)
    pair = pair_table[i0]
    return pair[:, :n_comp] * (1.0 - w) + pair[:, n_comp:] * w


def _line_matmul_max_rows():
    """Lines with at most this many rows interpolate via the soft-one-hot
    matmul (MXU) instead of gather/scatter; REN_VM_LINE_MATMUL=0 disables
    (A/B benchmarking escape hatch).  Read per call so setting the env var
    after import still takes effect.  The cap also bounds the (N, L)
    soft-one-hot transient: at the 2^20 sample budget a 1024-row cap is a
    ~4 GB f32 peak (built twice under checkpointing), which fits because
    nothing else large is live during the line stage."""
    import os

    return 0 if os.environ.get("REN_VM_LINE_MATMUL") == "0" else 1024


def _interp_1d_matmul(table, coord, resolution):
    """Linear interpolation as a soft-one-hot matmul: W @ table, where
    W (N, L) holds (1-w) at floor(p) and w at floor(p)+1.

    Same lerp values and derivatives as `_interp_1d` (the one-hot entries
    are exact), but the table gradient becomes the MXU matmul W^T @ g
    instead of a scatter-add of N narrow rows — for line tables (<= 1024
    rows) the matmul is ~5x cheaper than the scatter at megasample
    budgets (scatters cost ~45-70 ns/row, docs/PERFORMANCE.md).  W is an
    (N, L) f32 intermediate; callers checkpoint the encode so it is
    rebuilt in the backward pass instead of living in HBM.
    """
    p = coord * (resolution - 1)
    p0 = jnp.clip(jnp.floor(p), 0, resolution - 2)
    w = (p - p0)[:, None]
    i0 = p0.astype(jnp.int32)[:, None]
    iota = jnp.arange(resolution, dtype=jnp.int32)[None, :]
    weights = jnp.where(iota == i0, 1.0 - w, 0.0) + jnp.where(
        iota == i0 + 1, w, 0.0
    )
    return jnp.dot(
        weights, table, preferred_element_type=table.dtype
    )


def encode(params, x, meta: VMGridMeta):
    """Positions (..., 3) in [0,1]^3 -> (..., 3 * n_components) features.

    Uses packed tables: 1 quad-packed plane gather per component triple
    (vs 18 unpacked rows/sample); lines interpolate on the MXU via the
    soft-one-hot matmul when they fit (`_interp_1d_matmul`), falling back
    to the paired gather otherwise.  Values match the unpacked path up to
    fp reassociation (~1 ulp).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, meta.num_dim)
    x = jnp.clip(x, 0.0, 1.0)
    n_comp = meta.n_components
    line_matmul = meta.line_resolution <= _line_matmul_max_rows()
    feats = []
    for k, ((a, b), c) in enumerate(_PROJECTIONS):
        plane_feat = _interp_2d_quad(
            _quad_rows(params["planes"][k], meta.resolution),
            x[:, a], x[:, b], meta.resolution, n_comp,
        )
        if line_matmul:
            # checkpointed so the (N, L) soft-one-hot never lands in HBM
            # as a backward residual (2+ GB at megasample budgets)
            line_feat = jax.checkpoint(
                lambda t, cc: _interp_1d_matmul(
                    t, cc, meta.line_resolution
                )
            )(params["lines"][k], x[:, c])
        else:
            line_feat = _interp_1d_paired(
                _pair_rows(params["lines"][k]), x[:, c],
                meta.line_resolution, n_comp,
            )
        feats.append(plane_feat * line_feat)
    out = jnp.concatenate(feats, axis=-1)
    return out.reshape(*batch_shape, meta.output_dim)
