"""NeRF wrapper: rays, occupancy-accelerated rendering, grid updates.

Counterpart of the reference `models/nerf.py` (class NeRF), assembled from
the TPU-native pieces: the radiance field (models/fields.py), the occupancy
grid (models/occupancy.py), the fixed-shape marcher (ops/ray_march.py) and
the compositor (ops/composite.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import composite as composite_mod
from ..ops import ray_march
from ..utils import transforms
from . import fields, occupancy

NUM_DIM = 3
MAX_NUM_SAMPLES_PER_RAY = 1024  # robust_e_nerf.py:19


@dataclasses.dataclass(frozen=True)
class NerfSpec:
    field: Union[fields.NGPFieldSpec, fields.VanillaFieldSpec]
    occ: occupancy.OccGridSpec
    march_train: ray_march.MarchSpec
    march_eval: ray_march.MarchSpec
    render_step_size: float
    near_plane: Optional[float]
    far_plane: Optional[float]
    cone_angle: float
    early_stop_eps: float
    alpha_thre: float
    test_chunk_size: int
    render_bkgd: Optional[str]  # None | "parameter"
    radiance_dim: int
    opacity_eps: float = 1e-10
    # adaptive-compute levers (docs/PERFORMANCE.md round-3 findings);
    # both default off so reference configs stay reference-exact.
    # `visible_compact` reproduces the reference marcher's sigma_fn
    # visibility filter (external/utils.py:107-130) — samples whose
    # transmittance fell below early_stop_eps are dropped before the
    # differentiable render.  `sample_bucket_levels` > 1 enables the
    # static sample-prefix ladder (the fixed-shape counterpart of the
    # CUDA kernels' O(len(t_starts)) scaling).
    visible_compact: bool = False
    sample_bucket_levels: int = 1


def derive_render_step_size(nerf_config, aabb):
    """`render_step_size: auto` = sqrt(3) * max_extent / 1024
    (robust_e_nerf.py:220-228)."""
    if nerf_config["render_step_size"] == "auto":
        aabb = np.asarray(aabb, dtype=np.float64)
        return float(
            math.sqrt(NUM_DIM) * float(np.max(aabb[NUM_DIM:] - aabb[:NUM_DIM]))
            / MAX_NUM_SAMPLES_PER_RAY
        )
    return float(nerf_config["render_step_size"])


def build_nerf_spec(
    nerf_config,
    aabb,
    radiance_dim,
    render_bkgd,
    train_capacity,
    eval_capacity=None,
):
    """Static spec from the `model.nerf` config block (models/nerf.py:31-168).

    `train_capacity` is the compacted sample-buffer size for training — set it
    to (a margin above) `train_eff_ray_sample_batch_size / num_chips` so the
    per-chip field evaluation is exactly the reference's ray-sample budget.
    """
    contraction_type = nerf_config["contraction_type"]
    assert contraction_type in ("aabb", "sphere", "tanh")
    render_step_size = derive_render_step_size(nerf_config, aabb)
    near = nerf_config.get("near_plane")
    far = nerf_config.get("far_plane")
    cone_angle = float(nerf_config["cone_angle"])

    occ_spec = occupancy.build_spec(nerf_config["occ_grid"], contraction_type)

    max_s = ray_march.max_lattice_samples(
        aabb, render_step_size, near, far, contraction_type, cone_angle,
        hard_cap=MAX_NUM_SAMPLES_PER_RAY,
    )
    if eval_capacity is None:
        eval_capacity = train_capacity
    march_kwargs = dict(
        contraction_type=contraction_type,
        render_step_size=render_step_size,
        near_plane=None if near is None else float(near),
        far_plane=None if far is None else float(far),
        cone_angle=cone_angle,
        max_samples_per_ray=max_s,
    )
    march_train = ray_march.MarchSpec(capacity=int(train_capacity),
                                      **march_kwargs)
    march_eval = ray_march.MarchSpec(capacity=int(eval_capacity),
                                     **march_kwargs)

    field_spec = fields.build_field_spec(
        nerf_config["arch"],
        nerf_config[nerf_config["arch"]],
        contraction_type,
        radiance_dim,
        NUM_DIM,
    )
    return NerfSpec(
        field=field_spec,
        occ=occ_spec,
        march_train=march_train,
        march_eval=march_eval,
        render_step_size=render_step_size,
        near_plane=None if near is None else float(near),
        far_plane=None if far is None else float(far),
        cone_angle=cone_angle,
        early_stop_eps=float(nerf_config["early_stop_eps"]),
        alpha_thre=float(nerf_config["alpha_thre"]),
        test_chunk_size=int(nerf_config["test_chunk_size"]),
        render_bkgd=render_bkgd,
        radiance_dim=radiance_dim,
        visible_compact=bool(nerf_config.get("visible_compact", False)),
        sample_bucket_levels=int(
            nerf_config.get("sample_bucket_levels", 1)
        ),
    )


def init_nerf_params(key, spec: NerfSpec):
    k_field, _ = jax.random.split(key)
    params = {"radiance_field": fields.init_field(k_field, spec.field)}
    if spec.render_bkgd == "parameter":
        # softplus-constrained background initialized to 1.0
        # (models/nerf.py:79-90)
        params["render_bkgd_raw"] = jnp.full(
            (spec.radiance_dim,),
            transforms.inv_softplus(jnp.float32(1.0)),
            dtype=jnp.float32,
        )
    return params


def get_render_bkgd(params, spec: NerfSpec):
    if spec.render_bkgd == "parameter":
        return transforms.softplus(params["render_bkgd_raw"])
    return None


def pixel_params_to_ray(intrinsics_inv, pixel_position, t_wc_position,
                        t_wc_orientation):
    """Pixel coords + pose -> (ray origin, unit ray direction)
    (models/nerf.py:206-228).

    intrinsics_inv ([[M,] N,] 3, 3); pixel_position ([M,] N, 2);
    t_wc_position ([M,] N, 3); t_wc_orientation ([M,] N, 3, 3).
    """
    homog = jnp.concatenate(
        [pixel_position, jnp.ones_like(pixel_position[..., :1])], axis=-1
    )
    cam_dir = jnp.einsum("...ij,...j->...i", intrinsics_inv, homog)
    world_dir = jnp.einsum("...ij,...j->...i", t_wc_orientation, cam_dir)
    world_dir = world_dir / jnp.linalg.norm(
        world_dir, axis=-1, keepdims=True
    )
    return t_wc_position, world_dir


def _visible_compact_enabled(spec: "NerfSpec"):
    """Visibility-filtered rendering: `model.nerf.visible_compact` config
    key; the `REN_VISIBLE_COMPACT` env var (0/1), when set, overrides the
    config for A/B runs without a config edit."""
    import os

    env = os.environ.get("REN_VISIBLE_COMPACT")
    if env is not None:
        return env == "1"
    return spec.visible_compact


def _compact_visible(nerf_params, buf, origins, directions, aabb,
                     spec: NerfSpec, march_spec):
    """Re-compact the sample buffer to the transmittance-visible subset.

    The reference's marcher filters samples by a non-differentiable
    density pre-pass (nerfacc ray_marching's sigma_fn + render_visibility,
    external/utils.py:107-130): samples whose accumulated transmittance
    has fallen below `early_stop_eps` (or whose alpha is below
    `alpha_thre`) are dropped BEFORE rendering, and only the survivors are
    evaluated differentiably.  This reproduces that contract: a
    stop-gradient density forward over the marched buffer, the same
    visibility predicate, then a scatter compaction (ray-major order
    preserved) so the differentiable field eval — and its dominant
    table-gradient scatter — runs only on the visible subset (~10x fewer
    rows than marched once surfaces sharpen).  Costs one density-only
    forward; combine with the sample-prefix ladder so both passes scale
    with their live counts.
    """
    sg = jax.lax.stop_gradient
    num_rows = buf["t_mid"].shape[0]

    def _density_prefix(kb, b, origins, directions):
        sub = {k: (b[k][:kb] if k in ("ray_idx", "t_mid") else b[k])
               for k in ("ray_idx", "t_mid")}
        positions, _ = ray_march.sample_positions(
            {**sub, "t_mid": sg(sub["t_mid"])}, sg(origins),
            sg(directions)
        )
        s = fields.field_query_density(
            sg(nerf_params["radiance_field"]), positions, aabb, spec.field
        ).reshape(-1)
        return jnp.pad(s, (0, num_rows - kb))

    # the pre-pass is forward-only (no residual slots), so the prefix
    # ladder applies without the checkpoint workaround
    ladder = _sample_bucket_ladder(num_rows, spec.sample_bucket_levels)
    if len(ladder) == 1:
        sigma = _density_prefix(num_rows, buf, origins, directions)
    else:
        live = jnp.minimum(buf["total"], num_rows)
        idx = sum((live > kb).astype(jnp.int32) for kb in ladder[:-1])
        sigma = jax.lax.switch(
            idx,
            [(lambda op, kb=kb: _density_prefix(kb, *op))
             for kb in ladder],
            (buf, origins, directions),
        )
    alpha, trans = composite_mod.alpha_transmittance(sigma, buf)
    mask = composite_mod.visibility_mask(
        alpha, trans, buf["valid"], spec.early_stop_eps, spec.alpha_thre
    )

    # ray-major compaction: destination = visible ordinal
    mask_i = mask.astype(jnp.int32)
    dest = jnp.cumsum(mask_i) - 1
    total_vis = dest[-1] + 1
    src_of = jnp.zeros((num_rows,), jnp.int32).at[
        jnp.where(mask, dest, num_rows)
    ].set(jnp.arange(num_rows, dtype=jnp.int32), mode="drop")
    # per-ray visible counts via the compositor's blocked segment sums
    # (block-local f32 cumsums of 0/1 rows are exact); the mask column
    # stays 1-D — a (K, 1) f32 would tile-pad 128x (672 MB at 2^20)
    block = composite_mod.segment_block_size(
        march_spec.max_samples_per_ray
    )
    counts_vis = composite_mod._segment_sums(
        (mask_i.astype(jnp.float32),), buf["ray_first"],
        buf["counts"], block,
    )[:, 0].astype(jnp.int32)
    ends = jnp.cumsum(counts_vis)
    slot = jnp.arange(num_rows, dtype=jnp.int32)
    return {
        "ray_idx": buf["ray_idx"][src_of],
        "t_mid": buf["t_mid"][src_of],
        "delta": buf["delta"][src_of],
        "valid": slot < total_vis,
        "ray_first": (ends - counts_vis).astype(jnp.int32),
        "counts": counts_vis,
        "total": total_vis,
    }


def _sample_bucket_ladder(capacity, levels=1, min_bucket=8192):
    """Static sample-buffer prefix buckets, ascending, ending at the full
    capacity.  `model.nerf.sample_bucket_levels` sets the level count
    (default 1 = off: always evaluate the full buffer); the
    `REN_SAMPLE_BUCKETS` env var, when set, overrides it for A/B runs.

    Opt-in because the TPU backward pass does NOT share HLO temp space
    between lax.switch branches: with a 4-level ladder the 2^20-budget
    ngp graph asked for 62.9 G HBM vs ~8 G unbucketed (measured OOM
    before the non-top branches were checkpointed; see render_rays)."""
    import os

    env = os.environ.get("REN_SAMPLE_BUCKETS")
    if env is not None:
        levels = int(env)
    ladder = [capacity]
    kb = capacity
    while len(ladder) < levels and kb % 2 == 0 and kb // 2 >= min_bucket:
        kb //= 2
        ladder.append(kb)
    return sorted(ladder)


def render_rays(
    nerf_params,
    occ_binary,
    aabb,
    origins,        # (B, 3)
    directions,     # (B, 3)
    ray_valid,      # (B,) bool
    spec: NerfSpec,
    march_spec: ray_march.MarchSpec,
    key=None,       # stratified jitter (training)
    n_valid=None,   # () int: live-ray count -> bucketed marching
    compute_distortion=False,
):
    """Occupancy-accelerated volume rendering of a batch of rays.

    Returns (radiance (B, C), opacity (B,), depth (B,), n_visible (),
    total_marched (), regs).  `depth` is the expected termination
    distance along the ray normalized by opacity (models/nerf.py:267-285);
    the caller converts it to z-depth via the principal-axis cosine.
    `regs` holds the opt-in regularizer statistics (loss_metric/loss.py):
    `regs["sparsity"]` is the mean Cauchy sparsity log(1 + 2 sigma^2) over
    the valid marched samples (zero-cost unless consumed);
    `regs["distortion"]` is the mean per-ray mip-NeRF-360 distortion
    (ops/composite.py:distortion_sum) over the valid rays, computed only
    when `compute_distortion` (two extra K-row cumsums when on).
    """
    num_rays = origins.shape[0]
    buf = ray_march.march_and_compact(
        origins, directions, ray_valid, occ_binary, aabb, spec.occ,
        march_spec, key=key, n_valid=n_valid,
    )
    total_marched = buf["total"]
    if _visible_compact_enabled(spec):
        buf = _compact_visible(nerf_params, buf, origins, directions,
                               aabb, spec, march_spec)
    capacity = march_spec.capacity
    bkgd = get_render_bkgd(nerf_params, spec)

    def _render_prefix(kb, b, origins, directions):
        """Field eval + composite over the first `kb` (static) sample-buffer
        rows.  The buffer is compacted, so live samples are a prefix —
        the field eval (the expensive stage) runs on the smallest
        power-of-two prefix covering them, the sample-space counterpart
        of the marcher's ray bucketing: the reference's CUDA kernels cost
        O(len(t_starts)) by dynamic shape (external/utils.py:106-129);
        here the same adaptivity comes from a lax.switch ladder of static
        prefixes.  All branches share the (B,)-shaped outputs."""
        sub = dict(b)
        for k in ("ray_idx", "t_mid", "delta", "valid"):
            sub[k] = b[k][:kb]
        positions, dirs = ray_march.sample_positions(
            sub, origins, directions
        )
        field_fn = lambda p, x, d: fields.field_apply(  # noqa: E731
            p, x, d, aabb, spec.field
        )
        if getattr(spec.field, "remat", False):
            # rematerialize the field eval in the backward pass:
            # megasample encode intermediates (hash-corner gathers, wide
            # MLP activations) otherwise land in HBM as residuals and OOM
            # at the reference 2^20 sample budget
            field_fn = jax.checkpoint(field_fn)
        radiance, sigma = field_fn(
            nerf_params["radiance_field"], positions, dirs
        )
        outs = composite_mod.composite(
            sigma, radiance, sub, num_rays,
            render_bkgd=bkgd,
            early_stop_eps=spec.early_stop_eps,
            alpha_thre=spec.alpha_thre,
            max_samples_per_ray=march_spec.max_samples_per_ray,
            compute_distortion=compute_distortion,
        )
        colors, opacity, depth, n_visible = outs[:4]
        sigma_flat = sigma.reshape(-1)
        valid_f = sub["valid"].astype(sigma_flat.dtype)
        sig_sum = jnp.sum(valid_f * jnp.log1p(
            2.0 * sigma_flat * sigma_flat
        ))
        sig_cnt = jnp.sum(valid_f)
        dist = (outs[4] if compute_distortion
                else jnp.zeros((), sigma_flat.dtype))
        return colors, opacity, depth, n_visible, dist, sig_sum, sig_cnt

    ladder = _sample_bucket_ladder(capacity, spec.sample_bucket_levels)
    if len(ladder) == 1:
        (colors, opacity, depth, n_visible, dist_sum, sig_sum,
         sig_cnt) = _render_prefix(capacity, buf, origins, directions)
    else:
        live = jnp.minimum(buf["total"], capacity)
        bucket_idx = sum(
            (live > kb).astype(jnp.int32) for kb in ladder[:-1]
        )
        # EVERY branch is rematerialized: lax.switch's VJP emits a
        # residual slot per branch (zero-filled for the non-taken ones),
        # so un-checkpointed branches SUM their residual memory — the
        # 4-level ladder measured 50-63 G HBM at the 2^20 budget with no
        # checkpoints, and still 32.5 G with only the non-top branches
        # checkpointed: the top branch's K-sized residuals (a dozen
        # (K, <=64) MLP/encode activations) are copied across the switch
        # boundary where their lifetimes can no longer alias (64%
        # measured fragmentation).  Checkpointing all branches keeps
        # residuals branch-local: the backward recomputes the taken
        # branch's forward at bucket-proportional cost (~25% step at the
        # top bucket, negligible at the small buckets the sharp regime
        # actually takes).
        branches = [
            jax.checkpoint(lambda op, kb=kb: _render_prefix(kb, *op))
            for kb in ladder
        ]
        (colors, opacity, depth, n_visible, dist_sum, sig_sum,
         sig_cnt) = jax.lax.switch(
            bucket_idx, branches, (buf, origins, directions)
        )
    depth = depth / (opacity + spec.opacity_eps)
    sigma_reg = sig_sum / jnp.maximum(sig_cnt, 1.0)
    regs = {"sparsity": sigma_reg}
    if compute_distortion:
        n_valid_rays = jnp.maximum(
            jnp.sum(ray_valid, dtype=dist_sum.dtype), 1.0
        )
        regs["distortion"] = dist_sum / n_valid_rays
    else:
        regs["distortion"] = jnp.zeros((), jnp.float32)
    return colors, opacity, depth, n_visible, total_marched, regs


def ray_distance_to_z_depth(depth, ray_direction, t_wc_orientation):
    """Expected ray-termination distance -> z-depth: multiply by the cosine
    between the ray and the camera principal axis (robust_e_nerf.py:873-884,
    the NOTE about nerfstudio's convention)."""
    principal_axis = t_wc_orientation[..., 2]
    return depth * jnp.sum(ray_direction * principal_axis, axis=-1)


def make_occ_eval_fn(nerf_params, aabb, spec: NerfSpec,
                     trajectory_positions=None, key=None):
    """Occupancy evaluation closure: density * step size, with the
    cone-angle-aware step size sampled from random camera distances
    (models/nerf.py:170-198)."""

    def occ_eval_fn(x):
        density = fields.field_query_density(
            nerf_params["radiance_field"], x, aabb, spec.field
        )
        if spec.cone_angle > 0.0:
            assert trajectory_positions is not None and key is not None
            cam_ids = jax.random.randint(
                key, (x.shape[0],), 0, trajectory_positions.shape[0]
            )
            origins = trajectory_positions[cam_ids]
            t = jnp.linalg.norm(origins - x, axis=-1, keepdims=True)
            step = jnp.maximum(t * spec.cone_angle, spec.render_step_size)
            if spec.near_plane is not None and spec.far_plane is not None:
                step = jnp.where(
                    (t > spec.near_plane) & (t < spec.far_plane), step, 0.0
                )
            return density * step
        return density * spec.render_step_size

    return occ_eval_fn


def update_occ_grid(nerf_params, occ_state, key, step, aabb,
                    spec: NerfSpec, trajectory_positions=None,
                    warmup: bool = True):
    """One occupancy-grid update (nerfacc every_n_step semantics; the host
    training loop provides the every-`n` cadence and the warmup flag)."""
    k_eval, k_cells = jax.random.split(key)
    occ_eval_fn = make_occ_eval_fn(
        nerf_params, aabb, spec, trajectory_positions, k_eval
    )
    if warmup:
        return occupancy.update_all_cells(
            occ_state, occ_eval_fn, k_cells, aabb, spec.occ
        )
    return occupancy.update_sampled_cells(
        occ_state, occ_eval_fn, k_cells, aabb, spec.occ
    )
