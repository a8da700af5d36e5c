"""Occupancy grid acceleration structure.

TPU-native replacement for `nerfacc.OccupancyGrid` (used at
models/nerf.py:97-102,170-204).  The grid is a plain pytree of JAX arrays:

  occs    (num_cells,) float32   EMA of density * step_size per cell
  binary  (num_cells,) bool      occs > min(mean(occs), occ_thre)

The update protocol follows nerfacc 0.3.1 `every_n_step`:
  * every `n` steps (driven from the host training loop);
  * during warmup, evaluate *all* cells; afterwards sample num_cells/4
    uniformly plus num_cells/4 from currently-occupied cells;
  * each sampled cell is evaluated at a uniformly-jittered point inside the
    cell, placed back into world space via the inverse contraction;
  * EMA:  occs[idx] = max(occs[idx] * ema_decay, occ_eval(x));
  * binarize against min(mean(occs), occ_thre).

Occupied-cell sampling is done with the XLA-friendly inversion trick
(cumsum + searchsorted) instead of `nonzero` so shapes stay static.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import contraction


@dataclasses.dataclass(frozen=True)
class OccGridSpec:
    resolution: Tuple[int, int, int]
    occ_thre: float
    ema_decay: float
    warmup_steps: int
    update_interval: int  # the `n` of every_n_step
    contraction_type: str
    num_dim: int = 3

    @property
    def num_cells(self):
        return int(np.prod(self.resolution))


def build_spec(occ_grid_config, contraction_type, num_dim=3) -> OccGridSpec:
    res = occ_grid_config["resolution"]
    if isinstance(res, (int, float)):
        res = (int(res),) * num_dim
    else:
        res = tuple(int(r) for r in res)
    assert len(res) == num_dim
    return OccGridSpec(
        resolution=res,
        occ_thre=float(occ_grid_config["occ_thre"]),
        ema_decay=float(occ_grid_config["ema_decay"]),
        warmup_steps=int(occ_grid_config["warmup_steps"]),
        update_interval=int(occ_grid_config["n"]),
        contraction_type=contraction_type,
        num_dim=num_dim,
    )


def init_state(spec: OccGridSpec):
    return {
        "occs": jnp.zeros((spec.num_cells,), dtype=jnp.float32),
        "binary": jnp.zeros((spec.num_cells,), dtype=bool),
    }


def _cell_coords(indices, spec: OccGridSpec):
    """Flat cell index -> integer (x, y, z) grid coordinates.

    Flat layout is x-major (x * Ry * Rz + y * Rz + z) — internal convention;
    `cell_index_of` below uses the same layout for lookups.
    """
    rx, ry, rz = spec.resolution
    z = indices % rz
    y = (indices // rz) % ry
    x = indices // (ry * rz)
    del rx
    return jnp.stack([x, y, z], axis=-1)


def cell_index_of(contracted, spec: OccGridSpec):
    """Contracted [0,1]^3 position -> flat cell index (clamped)."""
    res = jnp.asarray(spec.resolution, dtype=jnp.float32)
    coords = jnp.clip(
        jnp.floor(contracted * res).astype(jnp.int32),
        0,
        jnp.asarray(spec.resolution, dtype=jnp.int32) - 1,
    )
    rx, ry, rz = spec.resolution
    del rx
    return (
        coords[..., 0] * (ry * rz) + coords[..., 1] * rz + coords[..., 2]
    )


def lookup(binary, contracted, spec: OccGridSpec):
    """Occupancy of contracted positions (gather from the binary grid)."""
    return binary[cell_index_of(contracted, spec)]


def _sample_cell_points(indices, key, aabb, spec: OccGridSpec):
    """Uniformly-jittered world-space point inside each indexed cell."""
    coords = _cell_coords(indices, spec).astype(jnp.float32)
    jitter = jax.random.uniform(key, coords.shape, dtype=jnp.float32)
    u = (coords + jitter) / jnp.asarray(spec.resolution, dtype=jnp.float32)
    return contraction.contract_inv(
        u, aabb, spec.contraction_type, spec.num_dim
    )


def _ema_update(state, indices, occ, spec: OccGridSpec):
    occs = state["occs"]
    current = occs[indices]
    occs = occs.at[indices].set(
        jnp.maximum(current * spec.ema_decay, occ)
    )
    binary = occs > jnp.minimum(jnp.mean(occs), spec.occ_thre)
    return {"occs": occs, "binary": binary}


def update_all_cells(state, occ_eval_fn, key, aabb, spec: OccGridSpec):
    """Warmup-phase update: evaluate every cell."""
    indices = jnp.arange(spec.num_cells, dtype=jnp.int32)
    x = _sample_cell_points(indices, key, aabb, spec)
    occ = occ_eval_fn(x).reshape(-1)
    return _ema_update(state, indices, occ, spec)


def update_sampled_cells(state, occ_eval_fn, key, aabb, spec: OccGridSpec):
    """Post-warmup update: num_cells/4 uniform + num_cells/4 occupied cells."""
    n = spec.num_cells // 4
    k_uniform, k_occ, k_jitter = jax.random.split(key, 3)
    uniform_indices = jax.random.randint(
        k_uniform, (n,), 0, spec.num_cells, dtype=jnp.int32
    )
    # inversion sampling of occupied cells: u ~ U{0, total-1},
    # index = searchsorted(cumsum(binary), u, side="right")
    binary = state["binary"].astype(jnp.int32)
    csum = jnp.cumsum(binary)
    total = csum[-1]
    u = jax.random.randint(
        k_occ, (n,), 0, jnp.maximum(total, 1), dtype=jnp.int32
    )
    occupied_indices = jnp.searchsorted(csum, u, side="right").astype(
        jnp.int32
    )
    occupied_indices = jnp.clip(occupied_indices, 0, spec.num_cells - 1)
    # no occupied cells yet -> fall back to uniform
    occupied_indices = jnp.where(
        total > 0, occupied_indices, uniform_indices
    )
    indices = jnp.concatenate([uniform_indices, occupied_indices])
    x = _sample_cell_points(indices, k_jitter, aabb, spec)
    occ = occ_eval_fn(x).reshape(-1)
    return _ema_update(state, indices, occ, spec)
