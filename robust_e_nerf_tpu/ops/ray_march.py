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
    use_pallas: bool = False  # fused mask kernel (ops/pallas/march_kernel)


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


def _march_prefix(origins, directions, t_min, t_max, step0, occ_binary,
                  aabb, occ_spec, spec: MarchSpec, prefix):
    """March the first `prefix` rays (a static bucket) and compact their
    surviving samples; ray-level outputs are padded back to the full batch.

    The lattice work — (prefix, S) occupancy probes, contraction math and
    per-row cumsums — scales with the bucket, while the compaction work
    scales with the fixed capacity K; rays beyond `prefix` were already
    folded into t_max == t_min by the caller, so any bucket >= the valid
    count is exact.
    """
    num_rays = origins.shape[0]
    num_samples = spec.max_samples_per_ray
    capacity = spec.capacity
    uniform_lattice = spec.cone_angle <= 0.0

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

    # ---- gather-based compaction (ray-major, marching order) ----
    # Work is O(b*S) elementwise + per-row scans plus O(K log S)
    # gathers; no scatters and no flat b*S-length scan (both are slow
    # on TPU).
    within = jnp.cumsum(mask.astype(jnp.int32), axis=1)   # (b, S)
    counts = within[:, -1]                                # (b,)

    ends = jnp.cumsum(counts)                             # (b,) inclusive
    starts = ends - counts
    total = ends[-1]

    slot = jnp.arange(capacity, dtype=jnp.int32)
    # source ray of each output slot: first ray whose cumulative end
    # exceeds the slot index (zero-count rays are skipped by side="right")
    ray_idx = jnp.searchsorted(ends, slot, side="right").astype(jnp.int32)
    ray_idx = jnp.minimum(ray_idx, prefix - 1)
    ordinal = slot - starts[ray_idx]                      # j-th kept sample

    # lower_bound: smallest s with within[ray, s] == ordinal + 1
    within_flat = within.reshape(-1)
    target = ordinal + 1
    lo = jnp.zeros((capacity,), jnp.int32)
    hi = jnp.full((capacity,), num_samples - 1, jnp.int32)
    for _ in range(max(1, (num_samples - 1).bit_length())):
        mid = (lo + hi) // 2
        value = within_flat[ray_idx * num_samples + mid]
        go_left = value >= target
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid + 1)
    sample_idx = lo

    valid = slot < total
    if uniform_lattice:
        # closed form: no (b, S) t arrays needed at all
        gathered_t_start = (
            t_min[ray_idx]
            + (sample_idx.astype(jnp.float32) + step0[ray_idx])
            * spec.render_step_size
        )
        gathered_delta = jnp.full(
            (capacity,), spec.render_step_size, jnp.float32
        )
    else:
        gathered_t_start = t_start[ray_idx, sample_idx]
        gathered_delta = delta[ray_idx, sample_idx]

    pad = num_rays - prefix
    return {
        "ray_idx": jnp.where(valid, ray_idx, 0),
        "t_mid": jnp.where(
            valid, gathered_t_start + 0.5 * gathered_delta, 0.0
        ),
        "delta": jnp.where(valid, gathered_delta, 0.0),
        "valid": valid,
        "ray_first": jnp.pad(
            starts.astype(jnp.int32), (0, pad), constant_values=0
        ),
        "counts": jnp.pad(counts, (0, pad)),
        "total": total,
    }


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
    num_samples = spec.max_samples_per_ray

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

    uniform_lattice = spec.cone_angle <= 0.0
    use_kernel = (
        spec.use_pallas
        and uniform_lattice
        and num_rays % 64 == 0
        and num_samples % 128 == 0
    )
    # ray_valid folds into t_max so all paths share it
    t_max = jnp.where(ray_valid, t_max, t_min)

    if use_kernel:
        from .pallas import march_kernel

        packed_planes = march_kernel.pack_occupancy(
            occ_binary, occ_spec.resolution
        )
        if packed_planes[0].shape[0] > 1024:
            use_kernel = False  # 256^3 grids exceed the one-hot budget
    if use_kernel:
        within = march_kernel.march_mask_cumsum(
            aabb, origins, directions, t_min, t_max, step0,
            packed_planes,
            num_samples,
            occ_spec.resolution,
            spec.contraction_type,
            spec.render_step_size,
            jax.default_backend() != "tpu",
        )
        counts = within[:, -1]
        return _compact_from_within(
            within, counts, t_min, step0, spec, num_rays
        )

    impl_args = (origins, directions, t_min, t_max, step0)

    if n_valid is None:
        return _march_prefix(
            *impl_args, occ_binary, aabb, occ_spec, spec, num_rays
        )

    buckets = _bucket_ladder(num_rays)
    if len(buckets) == 1:
        return _march_prefix(
            *impl_args, occ_binary, aabb, occ_spec, spec, num_rays
        )
    branches = [
        (lambda args, b=b: _march_prefix(
            *args[:5], args[5], aabb, occ_spec, spec, b
        ))
        for b in buckets
    ]
    bucket_idx = sum(
        (n_valid > b).astype(jnp.int32) for b in buckets[:-1]
    )
    return jax.lax.switch(
        bucket_idx, branches, impl_args + (occ_binary,)
    )


def _compact_from_within(within, counts, t_min, step0, spec: MarchSpec,
                         num_rays):
    """Compaction for the Pallas-kernel path (uniform lattice only)."""
    num_samples = spec.max_samples_per_ray
    capacity = spec.capacity
    ends = jnp.cumsum(counts)
    starts = ends - counts
    total = ends[-1]

    slot = jnp.arange(capacity, dtype=jnp.int32)
    ray_idx = jnp.searchsorted(ends, slot, side="right").astype(jnp.int32)
    ray_idx = jnp.minimum(ray_idx, num_rays - 1)
    ordinal = slot - starts[ray_idx]

    within_flat = within.reshape(-1)
    target = ordinal + 1
    lo = jnp.zeros((capacity,), jnp.int32)
    hi = jnp.full((capacity,), num_samples - 1, jnp.int32)
    for _ in range(max(1, (num_samples - 1).bit_length())):
        mid = (lo + hi) // 2
        value = within_flat[ray_idx * num_samples + mid]
        go_left = value >= target
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid + 1)
    sample_idx = lo

    valid = slot < total
    gathered_t_start = (
        t_min[ray_idx]
        + (sample_idx.astype(jnp.float32) + step0[ray_idx])
        * spec.render_step_size
    )
    gathered_delta = jnp.full((capacity,), spec.render_step_size,
                              jnp.float32)
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
