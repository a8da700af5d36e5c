"""Fixed-shape occupancy-skipping ray marching with global sample compaction.

TPU-native replacement for `nerfacc.ray_marching` (used at
external/utils.py:106-119).  The CUDA version emits ragged
(ray_indices, t_starts, t_ends); XLA needs static shapes, so instead:

  1. every ray gets a static lattice of at most S candidate samples
     (uniform steps of `render_step_size`, growing geometrically when
     `cone_angle` > 0, stratified per-ray jitter in training — the same
     sample positions the reference's DDA marcher visits);
  2. candidates are masked by AABB/near-far clipping, occupancy-grid lookup
     and ray validity;
  3. surviving candidates are compacted (cumsum + scatter) into a
     fixed-capacity sample buffer, ray-major and in marching order.

The compacted buffer is the static shape the rest of the pipeline sees: the
field evaluation is always a dense `capacity x features` matmul on the MXU,
independent of how many rays the dynamic batch-size controller requests —
the reference's "constant ray-sample budget" invariant
(robust_e_nerf.py:907-950) becomes the compiled shape itself.

Gradients: like nerfacc's `rendering` (vol_rendering.py:37), outputs are
*not* differentiable w.r.t. the sample t values; positions are computed by
the caller as `origin[ray] + dir[ray] * stop_grad(t_mid)` so gradients (and
jvp tangents for the l_grad loss) flow through ray origins/directions only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import contraction as contraction_mod
from ..models import occupancy


@dataclasses.dataclass(frozen=True)
class MarchSpec:
    """Static marching configuration (from the `nerf` config block)."""

    contraction_type: str
    render_step_size: float
    near_plane: Optional[float]
    far_plane: Optional[float]
    cone_angle: float
    max_samples_per_ray: int  # S: static lattice length
    capacity: int             # K: compacted sample-buffer length


def max_lattice_samples(aabb, render_step_size, near_plane, far_plane,
                        contraction_type, cone_angle,
                        hard_cap=1024):
    """Static bound S on the per-ray sample count.

    For AABB contraction the ray segment inside the box is at most the box
    diagonal; with the reference's `auto` step size
    (sqrt(3) * max_extent / 1024, robust_e_nerf.py:220-228) this yields
    exactly 1024.  For unbounded contractions near/far planes bound the
    segment.  A positive cone angle turns the tail of the lattice geometric,
    which only shrinks the count.
    """
    import numpy as np

    aabb = np.asarray(aabb, dtype=np.float64)
    if contraction_type == contraction_mod.AABB:
        seg = float(np.linalg.norm(aabb[3:] - aabb[:3]))
        if near_plane is not None and far_plane is not None:
            seg = min(seg, far_plane - near_plane)
    else:
        assert near_plane is not None and far_plane is not None, (
            "unbounded contractions need near/far planes"
        )
        seg = far_plane - near_plane
    if cone_angle > 0.0:
        near = near_plane if near_plane is not None else render_step_size
        near = max(near, render_step_size)
        far = near + seg
        # linear until t * cone_angle > dt, then geometric
        t_lin = render_step_size / cone_angle
        n_lin = int(np.ceil(max(0.0, (min(t_lin, far) - near))
                            / render_step_size)) + 1
        if far > t_lin:
            n_geo = int(np.ceil(np.log(far / max(t_lin, near))
                                / np.log1p(cone_angle))) + 1
        else:
            n_geo = 0
        count = n_lin + n_geo
    else:
        count = int(np.ceil(seg / render_step_size)) + 1
    return int(min(count, hard_cap))


def ray_aabb_intersect(origins, directions, aabb):
    """Slab-method ray/AABB intersection -> (t_min, t_max), t_min >= 0."""
    lo, hi = aabb[:3], aabb[3:]
    inv_d = 1.0 / jnp.where(
        jnp.abs(directions) > 1e-10, directions,
        jnp.where(directions >= 0, 1e-10, -1e-10),
    )
    t0 = (lo - origins) * inv_d
    t1 = (hi - origins) * inv_d
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_min = jnp.maximum(t_min, 0.0)
    return t_min, t_max


def _sample_lattice(t_min, step0, spec: MarchSpec):
    """t value of lattice sample i (vectorized over rays and samples).

    cone_angle == 0: t_i = t_min + i * dt.
    cone_angle > 0: step size max(t * cone, dt) — linear near the camera,
    geometric afterwards (nerfacc's cone marching; cf. the occupancy update
    closure at models/nerf.py:175-193).
    """
    num_samples = spec.max_samples_per_ray
    i = jnp.arange(num_samples, dtype=jnp.float32)[None, :]  # (1, S)
    dt = spec.render_step_size
    if spec.cone_angle <= 0.0:
        t = t_min[:, None] + (i + step0[:, None]) * dt
        delta = jnp.full_like(t, dt)
        return t, delta
    cone = spec.cone_angle
    start = t_min[:, None] + step0[:, None] * dt
    t_lin = dt / cone  # below this, step = dt
    n_lin = jnp.ceil(jnp.maximum(t_lin - start, 0.0) / dt)
    t_linear = start + i * dt
    geo_start = start + n_lin * dt
    t_geo = geo_start * (1.0 + cone) ** jnp.maximum(i - n_lin, 0.0)
    t = jnp.where(i < n_lin, t_linear, t_geo)
    delta = jnp.maximum(t * cone, dt)
    return t, delta


def _march_mask_prefix(origins, directions, t_min, t_max, step0,
                       occ_binary, aabb, occ_spec, spec: MarchSpec,
                       prefix):
    """Lattice + occupancy mask for the first `prefix` rays (a static
    bucket) -> bit-packed mask (words, cumulative popcounts).

    The O(prefix x S) work — occupancy probes, contraction math, per-row
    cumsums — scales with the bucket.  Rays beyond `prefix` were already
    folded into t_max == t_min by the caller, so any bucket >= the live
    count is exact.
    """
    t_min_b = t_min[:prefix]
    t_max_b = t_max[:prefix]
    step0_b = step0[:prefix]

    t_start, delta = _sample_lattice(t_min_b, step0_b, spec)  # (b, S)
    t_mid = t_start + 0.5 * delta

    # per-coordinate math: (b, S, 3) intermediates would be padded 42x
    # by the TPU's (8, 128) tiling (docs/PERFORMANCE.md)
    px = origins[:prefix, 0:1] + directions[:prefix, 0:1] * t_mid  # (b, S)
    py = origins[:prefix, 1:2] + directions[:prefix, 1:2] * t_mid
    pz = origins[:prefix, 2:3] + directions[:prefix, 2:3] * t_mid
    cx, cy, cz = contraction_mod.contract_coords(
        px, py, pz, aabb, spec.contraction_type
    )
    res = occ_spec.resolution
    ix = jnp.clip((cx * res[0]).astype(jnp.int32), 0, res[0] - 1)
    iy = jnp.clip((cy * res[1]).astype(jnp.int32), 0, res[1] - 1)
    iz = jnp.clip((cz * res[2]).astype(jnp.int32), 0, res[2] - 1)
    cell = ix * (res[1] * res[2]) + iy * res[2] + iz
    occupied = occ_binary[cell]

    in_range = (
        (t_mid < t_max_b[:, None]) & (t_max_b[:, None] > t_min_b[:, None])
    )
    mask = in_range & occupied                            # (b, S)
    return _pack_mask_words(mask)


WORD_BITS = 32


def _pack_mask_words(mask):
    """(b, S) bool mask -> (words (b, W) uint32, cum_words (b, W) int32).

    Bit-packing shrinks the compaction's search space 32x: the cumulative
    popcounts (b, W) replace the (b, S) int32 cumsum (128x less memory),
    and the final bit position is resolved from the gathered word in
    registers (lax.population_count bisection) instead of more gathers.
    """
    b, num_samples = mask.shape
    num_words = -(-num_samples // WORD_BITS)
    pad = num_words * WORD_BITS - num_samples
    bits = mask.astype(jnp.uint32)
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(b, num_words, WORD_BITS)
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32))
    words = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)
    cum_words = jnp.cumsum(
        jax.lax.population_count(words).astype(jnp.int32), axis=1
    )
    return words, cum_words


def _select_bit(word, j):
    """Index of the j-th (1-based) set bit of a uint32, by bisection on
    prefix popcounts — pure vector ops, no memory traffic."""
    pos = jnp.zeros_like(j)
    for width in (16, 8, 4, 2, 1):
        low_mask = (
            (jnp.uint32(1) << (pos + width).astype(jnp.uint32))
            - jnp.uint32(1)
        )
        in_prefix = jax.lax.population_count(
            word & low_mask
        ).astype(jnp.int32) >= j
        pos = jnp.where(in_prefix, pos, pos + width)
    return pos


def _lattice_t_at(t_min_g, step0_g, sample_idx, spec: MarchSpec):
    """(t_start, delta) of lattice sample `sample_idx`, element-wise.

    The closed form of `_sample_lattice` evaluated at gathered positions,
    so compaction never needs the (B, S) t arrays — for both the uniform
    and the cone (geometric-tail) lattice.
    """
    i = sample_idx.astype(jnp.float32)
    dt = spec.render_step_size
    if spec.cone_angle <= 0.0:
        t = t_min_g + (i + step0_g) * dt
        return t, jnp.full_like(t, dt)
    cone = spec.cone_angle
    start = t_min_g + step0_g * dt
    t_lin = dt / cone
    n_lin = jnp.ceil(jnp.maximum(t_lin - start, 0.0) / dt)
    t_linear = start + i * dt
    geo_start = start + n_lin * dt
    t_geo = geo_start * (1.0 + cone) ** jnp.maximum(i - n_lin, 0.0)
    t = jnp.where(i < n_lin, t_linear, t_geo)
    delta = jnp.maximum(t * cone, dt)
    return t, delta


def _compact_from_words(words, cum_words, t_min, step0,
                        spec: MarchSpec, num_rays):
    """Gather-based compaction from the bit-packed mask into the
    fixed-capacity sample buffer — ray-major, marching order.

    Per output slot: TWO gathers total (the packed word and its
    cumulative popcount) — the ray search and the word search are both
    replaced by scatters of the b ray ends / b*W word boundaries into
    slot space followed by cumsums (the queries are arange(K), so
    searchsorted degenerates to a histogram).  The bit position within
    the word resolves in registers via popcount bisection.  t values are
    recomputed analytically (`_lattice_t_at`), so nothing (b, S)-shaped
    survives the mask stage.
    """
    capacity = spec.capacity
    prefix, num_words = words.shape
    counts = cum_words[:, -1]
    ends = jnp.cumsum(counts)                             # (b,) inclusive
    starts = ends - counts
    total = ends[-1]

    slot = jnp.arange(capacity, dtype=jnp.int32)
    # Source ray of each output slot = #rays with ends <= slot.  Because
    # `slot` is just arange(K), this searchsorted is a SCATTER of the b ray
    # ends into slot space + a cumsum — b rows instead of K log b gathers.
    ray_marks = jnp.zeros((capacity + 1,), jnp.int32).at[
        jnp.clip(ends, 0, capacity)
    ].add(1)
    ray_idx = jnp.cumsum(ray_marks)[:capacity]
    ray_idx = jnp.minimum(ray_idx, prefix - 1)
    ordinal = slot - starts[ray_idx]                      # j-th kept sample
    target = ordinal + 1

    # Word of the target bit = #words of this ray whose cumulative
    # popcount <= ordinal.  Same trick one level down: scatter every
    # (ray, word) boundary position starts[ray] + cum_words[ray, word]
    # into slot space; the cumulative mark count at `slot` counts all
    # boundary marks <= slot, which is (full words of finished rays =
    # num_words * ray_idx) + (this ray's words with cum <= ordinal).
    word_positions = jnp.clip(
        starts[:, None] + cum_words, 0, capacity
    ).reshape(-1)
    word_marks = jnp.zeros((capacity + 1,), jnp.int32).at[
        word_positions
    ].add(1)
    word_idx = jnp.cumsum(word_marks)[:capacity] - num_words * ray_idx
    word_idx = jnp.clip(word_idx, 0, num_words - 1)

    row_base = ray_idx * num_words
    word = words.reshape(-1)[row_base + word_idx]
    cum_at = cum_words.reshape(-1)[row_base + word_idx]
    before = cum_at - jax.lax.population_count(word).astype(jnp.int32)
    bit = _select_bit(word, target - before)
    sample_idx = word_idx * WORD_BITS + bit

    valid = slot < total
    gathered_t_start, gathered_delta = _lattice_t_at(
        t_min[ray_idx], step0[ray_idx], sample_idx, spec
    )
    return {
        "ray_idx": jnp.where(valid, ray_idx, 0),
        "t_mid": jnp.where(
            valid, gathered_t_start + 0.5 * gathered_delta, 0.0
        ),
        "delta": jnp.where(valid, gathered_delta, 0.0),
        "valid": valid,
        "ray_first": starts.astype(jnp.int32),
        "counts": counts,
        "total": total,
    }


def _march_prefix(origins, directions, t_min, t_max, step0, occ_binary,
                  aabb, occ_spec, spec: MarchSpec, prefix):
    """March a static ray bucket and compact; ray-level outputs padded back
    to the full batch so every bucket branch shares output shapes."""
    num_rays = origins.shape[0]
    words, cum_words = _march_mask_prefix(
        origins, directions, t_min, t_max, step0, occ_binary, aabb,
        occ_spec, spec, prefix,
    )
    buf = _compact_from_words(words, cum_words, t_min, step0, spec,
                              num_rays)
    pad = num_rays - prefix
    if pad:
        buf["ray_first"] = jnp.pad(buf["ray_first"], (0, pad))
        buf["counts"] = jnp.pad(buf["counts"], (0, pad))
    return buf


def _bucket_ladder(num_rays, min_bucket=256, levels=6):
    """Static power-of-two ray-count buckets, ascending, ending at the full
    batch."""
    buckets = [num_rays]
    b = num_rays
    while len(buckets) < levels and (b + 1) // 2 >= min_bucket:
        b = (b + 1) // 2
        buckets.append(b)
    return sorted(buckets)


def march_and_compact(
    origins,            # (B, 3)
    directions,         # (B, 3)
    ray_valid,          # (B,) bool
    occ_binary,         # (num_cells,) bool
    aabb,               # (6,)
    occ_spec: occupancy.OccGridSpec,
    spec: MarchSpec,
    key=None,           # stratified jitter when not None (training)
    n_valid=None,       # () int: rays [0, n_valid) are live -> bucketing
):
    """March all rays and compact surviving samples into the fixed buffer.

    When `n_valid` (a device scalar counting live rays, which the training
    batch keeps as a prefix) is given, the O(B*S) lattice work runs on the
    smallest power-of-two ray bucket >= n_valid via lax.switch — the
    fixed-shape answer to "the dynamic batch is usually far below the batch
    capacity" (the controller targets budget / samples-per-ray, so at 300+
    samples/ray the live count is ~10% of capacity).  All branches share
    the compiled output shapes; only the selected branch executes.
    Compaction stays inside each branch so its search gathers read the
    bucket-sized cumsum (measured faster than a shared full-batch
    compaction), while the fori_loop search keeps the per-branch graph
    small enough to compile at megasample capacities.

    Returns a dict:
      ray_idx   (K,) int32   source ray of each buffered sample
      t_mid     (K,) f32     midpoint distance along the ray
      delta     (K,) f32     step size (t_end - t_start)
      valid     (K,) bool    buffer-slot validity
      ray_first (B,) int32   buffer index of each ray's first sample
      counts    (B,) int32   per-ray surviving-sample count
      total     ()  int32    surviving samples before capacity clipping
    """
    num_rays = origins.shape[0]

    if spec.contraction_type == contraction_mod.AABB:
        t_min, t_max = ray_aabb_intersect(origins, directions, aabb)
    else:
        t_min = jnp.zeros((num_rays,), jnp.float32)
        t_max = jnp.full((num_rays,), jnp.inf, jnp.float32)
    if spec.near_plane is not None:
        t_min = jnp.maximum(t_min, spec.near_plane)
    if spec.far_plane is not None:
        t_max = jnp.minimum(t_max, spec.far_plane)

    if key is not None:
        step0 = jax.random.uniform(key, (num_rays,), dtype=jnp.float32)
    else:
        step0 = jnp.zeros((num_rays,), jnp.float32)

    # ray_valid folds into t_max so all paths share it
    t_max = jnp.where(ray_valid, t_max, t_min)

    if n_valid is None:
        return _march_prefix(
            origins, directions, t_min, t_max, step0, occ_binary, aabb,
            occ_spec, spec, num_rays,
        )

    buckets = _bucket_ladder(num_rays)
    if len(buckets) == 1:
        return _march_prefix(
            origins, directions, t_min, t_max, step0, occ_binary, aabb,
            occ_spec, spec, num_rays,
        )
    branches = [
        (lambda args, b=b: _march_prefix(*args, aabb, occ_spec, spec, b))
        for b in buckets
    ]
    bucket_idx = sum(
        (n_valid > b).astype(jnp.int32) for b in buckets[:-1]
    )
    return jax.lax.switch(
        bucket_idx, branches,
        (origins, directions, t_min, t_max, step0, occ_binary),
    )


def sample_positions(buf, origins, directions):
    """World positions & directions of the buffered samples.

    Differentiable w.r.t. `origins`/`directions` (gather), not w.r.t. the
    t values (stop_gradient) — matching nerfacc's differentiability contract
    (vol_rendering.py:37).
    """
    t = jax.lax.stop_gradient(buf["t_mid"])
    o = origins[buf["ray_idx"]]
    d = directions[buf["ray_idx"]]
    return o + d * t[:, None], d
