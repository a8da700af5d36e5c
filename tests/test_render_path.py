"""Ray marching + compositing vs closed-form volume rendering oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import contraction, occupancy
from robust_e_nerf_tpu.ops import composite as comp
from robust_e_nerf_tpu.ops import ray_march

AABB = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], np.float32)


def make_occ_spec(res=16):
    return occupancy.build_spec(
        {"resolution": res, "occ_thre": 0.01, "ema_decay": 0.95,
         "warmup_steps": 1, "n": 1},
        contraction.AABB,
    )


def march(origins, directions, occ_binary, spec, occ_spec, key=None,
          valid=None):
    if valid is None:
        valid = jnp.ones(origins.shape[0], bool)
    return ray_march.march_and_compact(
        jnp.asarray(origins), jnp.asarray(directions), valid,
        jnp.asarray(occ_binary), jnp.asarray(AABB), occ_spec, spec,
        key=key,
    )


def test_march_uniform_lattice_counts():
    """Fully occupied grid: sample count equals the in-AABB segment length
    over dt (rays along +x through the box center)."""
    occ_spec = make_occ_spec()
    dt = 0.05
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=dt,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=64, capacity=1024,
    )
    origins = np.array([[-2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]], np.float32)
    directions = np.array([[1.0, 0, 0], [1.0, 0, 0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    buf = march(origins, directions, occ, spec, occ_spec)
    # segment through the box is 2.0 long -> 2.0/dt = 40 samples per ray
    counts = np.asarray(buf["counts"])
    assert np.all(np.abs(counts - 40) <= 1)
    assert int(buf["total"]) == counts.sum()
    # samples are ray-major and in marching order
    t_mid = np.asarray(buf["t_mid"])
    valid = np.asarray(buf["valid"])
    ray_idx = np.asarray(buf["ray_idx"])
    first_ray = t_mid[valid & (ray_idx == 0)]
    assert np.all(np.diff(first_ray) > 0)


def test_march_respects_occupancy():
    """Only the occupied half-space x > 0 should be sampled."""
    occ_spec = make_occ_spec(res=8)
    dt = 0.05
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=dt,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=64, capacity=512,
    )
    # cells with x-coordinate in the upper half
    res = occ_spec.resolution
    occ = np.zeros(res, bool)
    occ[res[0] // 2:, :, :] = True
    origins = np.array([[-2.0, 0.05, 0.05]], np.float32)
    directions = np.array([[1.0, 0, 0]], np.float32)
    buf = march(origins, directions, occ.reshape(-1), spec, occ_spec)
    valid = np.asarray(buf["valid"])
    t_mid = np.asarray(buf["t_mid"])[valid]
    positions = origins[0] + directions[0] * t_mid[:, None]
    assert np.all(positions[:, 0] > -1e-6)
    assert len(t_mid) >= 15  # roughly half of the 40-sample segment


def test_march_ray_valid_mask():
    occ_spec = make_occ_spec()
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.1,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=32, capacity=128,
    )
    origins = np.tile(np.array([[-2.0, 0, 0]], np.float32), (2, 1))
    directions = np.tile(np.array([[1.0, 0, 0]], np.float32), (2, 1))
    occ = np.ones(occ_spec.num_cells, bool)
    buf = march(origins, directions, occ, spec, occ_spec,
                valid=jnp.asarray([True, False]))
    counts = np.asarray(buf["counts"])
    assert counts[0] > 0 and counts[1] == 0


def test_composite_constant_density_closed_form():
    """Constant density sigma: opacity = 1 - exp(-sigma * L), radiance =
    color * opacity, depth = analytic expected termination."""
    occ_spec = make_occ_spec()
    dt = 0.002
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=dt,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=1024, capacity=4096,
    )
    origins = np.array([[-2.0, 0.0, 0.0]], np.float32)
    directions = np.array([[1.0, 0.0, 0.0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    buf = march(origins, directions, occ, spec, occ_spec)

    sigma_val, color_val = 1.7, 0.6
    sigma = jnp.full((spec.capacity,), sigma_val)
    radiance = jnp.full((spec.capacity, 1), color_val)
    colors, opacity, depth, n_vis = comp.composite(
        sigma, radiance, buf, 1, early_stop_eps=0.0, alpha_thre=0.0
    )
    length = 2.0  # chord length through the box
    expected_opacity = 1 - np.exp(-sigma_val * length)
    np.testing.assert_allclose(float(opacity[0]), expected_opacity,
                               rtol=1e-3)
    np.testing.assert_allclose(float(colors[0, 0]),
                               color_val * expected_opacity, rtol=1e-3)
    # expected termination distance: int t sigma e^{-sigma(t-t0)} dt
    t0 = 1.0  # entry at x=-1 from origin x=-2
    expected_depth = (
        t0 * expected_opacity
        + (1 / sigma_val) * (1 - np.exp(-sigma_val * length))
        - length * np.exp(-sigma_val * length)
    )
    np.testing.assert_allclose(float(depth[0]), expected_depth, rtol=5e-3)


def test_composite_background_and_early_stop():
    occ_spec = make_occ_spec()
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.01,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=512, capacity=1024,
    )
    origins = np.array([[-2.0, 0, 0]], np.float32)
    directions = np.array([[1.0, 0, 0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    buf = march(origins, directions, occ, spec, occ_spec)
    sigma = jnp.full((spec.capacity,), 50.0)  # essentially opaque
    radiance = jnp.full((spec.capacity, 1), 0.3)
    bkgd = jnp.asarray([0.9])
    colors, opacity, _, n_vis = comp.composite(
        sigma, radiance, buf, 1, render_bkgd=bkgd, early_stop_eps=1e-4,
        alpha_thre=0.0,
    )
    np.testing.assert_allclose(float(opacity[0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(colors[0, 0]), 0.3, atol=1e-3)
    # early stop: far fewer samples marked visible than marched
    assert int(n_vis) < int(buf["total"])


def test_composite_gradients_flow_to_sigma_and_rgb():
    occ_spec = make_occ_spec()
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.05,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=64, capacity=256,
    )
    origins = np.array([[-2.0, 0, 0]], np.float32)
    directions = np.array([[1.0, 0, 0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    buf = march(origins, directions, occ, spec, occ_spec)

    def f(sigma_scalar):
        sigma = jnp.full((spec.capacity,), sigma_scalar)
        radiance = jnp.full((spec.capacity, 1), 0.5)
        colors, _, _, _ = comp.composite(
            sigma, radiance, buf, 1, early_stop_eps=0.0, alpha_thre=0.0
        )
        return colors[0, 0]

    g = jax.grad(f)(1.0)
    eps = 1e-3
    fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_stratified_jitter_changes_samples():
    occ_spec = make_occ_spec()
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.1,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=32, capacity=64,
    )
    origins = np.array([[-2.0, 0, 0]], np.float32)
    directions = np.array([[1.0, 0, 0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    buf1 = march(origins, directions, occ, spec, occ_spec,
                 key=jax.random.PRNGKey(1))
    buf2 = march(origins, directions, occ, spec, occ_spec,
                 key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(buf1["t_mid"]),
                           np.asarray(buf2["t_mid"]))


@pytest.mark.parametrize("cone_angle", [0.004])
def test_cone_marching_step_growth(cone_angle):
    occ_spec = make_occ_spec()
    spec = ray_march.MarchSpec(
        contraction_type=contraction.SPHERE, render_step_size=0.01,
        near_plane=0.1, far_plane=10.0, cone_angle=cone_angle,
        max_samples_per_ray=ray_march.max_lattice_samples(
            AABB, 0.01, 0.1, 10.0, contraction.SPHERE, cone_angle
        ),
        capacity=8192,
    )
    origins = np.array([[0.0, 0, 0]], np.float32)
    directions = np.array([[1.0, 0, 0]], np.float32)
    occ = np.ones(occ_spec.num_cells, bool)
    occ_spec_sphere = occupancy.build_spec(
        {"resolution": 16, "occ_thre": 0.01, "ema_decay": 0.95,
         "warmup_steps": 1, "n": 1},
        contraction.SPHERE,
    )
    buf = ray_march.march_and_compact(
        jnp.asarray(origins), jnp.asarray(directions),
        jnp.ones(1, bool), jnp.asarray(occ), jnp.asarray(AABB),
        occ_spec_sphere, spec, key=None,
    )
    valid = np.asarray(buf["valid"])
    t = np.asarray(buf["t_mid"])[valid]
    deltas = np.asarray(buf["delta"])[valid]
    # far samples must take larger steps (geometric growth)
    assert deltas[-1] > deltas[0]
    assert t[-1] <= 10.0 + 0.5
    # step never below dt
    assert np.all(deltas >= 0.01 - 1e-6)


def test_bucketed_march_matches_full(rng):
    """march_and_compact(n_valid=...) (the lax.switch bucket path) must be
    bit-identical to the full-batch path for any live-ray prefix."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_e_nerf_tpu.models import occupancy
    from robust_e_nerf_tpu.ops import ray_march

    num_rays, S = 640, 128
    occ_spec = occupancy.OccGridSpec(
        resolution=(16, 16, 16), contraction_type="aabb", occ_thre=1e-2,
        ema_decay=0.95, warmup_steps=1, update_interval=16,
    )
    spec = ray_march.MarchSpec(
        contraction_type="aabb", render_step_size=float(np.sqrt(3) * 3 / S),
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=S, capacity=4096,
    )
    aabb = jnp.asarray([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], jnp.float32)
    occ = jnp.asarray(rng.random(16**3) < 0.4)

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    origins = jnp.asarray(
        np.repeat([[-2.5, 0.1, -0.2]], num_rays, axis=0), jnp.float32
    )
    dirs = jax.random.normal(k1, (num_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    for count in (1, 17, 256, 400, 640):
        valid = jnp.arange(num_rays) < count
        full = ray_march.march_and_compact(
            origins, dirs, valid, occ, aabb, occ_spec, spec, key=k2
        )
        bucketed = ray_march.march_and_compact(
            origins, dirs, valid, occ, aabb, occ_spec, spec, key=k2,
            n_valid=jnp.int32(count),
        )
        assert int(full["total"]) == int(bucketed["total"])
        for name in ("ray_idx", "valid", "counts"):
            np.testing.assert_array_equal(
                np.asarray(full[name]), np.asarray(bucketed[name]),
                err_msg=f"{name} @ count={count}",
            )
        # float outputs may differ by 1 ulp across the two compilations
        # (different fusion choices), never more
        for name in ("t_mid", "delta"):
            np.testing.assert_allclose(
                np.asarray(full[name]), np.asarray(bucketed[name]),
                rtol=1e-6, atol=1e-6, err_msg=f"{name} @ count={count}",
            )
        # ray_first only meaningful for rays with samples
        counts = np.asarray(full["counts"])
        np.testing.assert_array_equal(
            np.asarray(full["ray_first"])[counts > 0],
            np.asarray(bucketed["ray_first"])[counts > 0],
        )


def test_render_rays_sigma_reg_is_mean_cauchy():
    """render_rays' sigma_reg output = mean log(1 + 2 sigma^2) over the
    valid marched samples (the opt-in density-sparsity term's statistic,
    loss_metric/loss.py LossSpec.weight_density_sparsity)."""
    from robust_e_nerf_tpu.models import fields, nerf as nerf_mod

    occ_spec = make_occ_spec()
    field_spec = fields.build_field_spec("mlp", {
        "net_depth": 1, "net_width": 8, "skip_layer": 4,
        "net_depth_condition": 1, "net_width_condition": 8,
        "hidden_activation": "softplus",
        "density_activation": "shifted_trunc_exp",
        "radiance_activation": "softplus",
        "pos_encoder_max_deg": 2, "view_encoder_max_deg": 1,
        "weight_norm": False,
    }, "aabb", 1, 3)
    march_spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.05,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=128, capacity=512,
    )
    spec = nerf_mod.NerfSpec(
        field=field_spec, occ=occ_spec, march_train=march_spec,
        march_eval=march_spec, render_step_size=0.05, near_plane=None,
        far_plane=None, cone_angle=0.0, early_stop_eps=1e-4,
        alpha_thre=0.0, test_chunk_size=512, render_bkgd=None,
        radiance_dim=1,
    )
    params = {"radiance_field": fields.init_field(
        jax.random.PRNGKey(0), field_spec
    )}
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    origins = jnp.asarray([[-2.0, 0.0, 0.0], [0.0, -2.0, 0.0]],
                          jnp.float32)
    directions = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                             jnp.float32)
    occ = jnp.ones(occ_spec.num_cells, bool)
    valid = jnp.asarray([True, True])
    *_, regs = nerf_mod.render_rays(
        params, occ, aabb, origins, directions, valid, spec, march_spec,
    )
    sigma_reg = regs["sparsity"]
    # oracle: recompute from the marched buffer + field densities
    buf = ray_march.march_and_compact(
        origins, directions, valid, occ, aabb, occ_spec, march_spec,
    )
    positions, _dirs = ray_march.sample_positions(buf, origins, directions)
    sigma = fields.field_query_density(
        params["radiance_field"], positions, aabb, field_spec
    ).reshape(-1)
    m = np.asarray(buf["valid"], dtype=np.float64)
    want = float(
        (m * np.log1p(2.0 * np.asarray(sigma, np.float64) ** 2)).sum()
        / max(m.sum(), 1.0)
    )
    np.testing.assert_allclose(float(sigma_reg), want, rtol=1e-5)


def test_composite_cumsum_matches_scatter():
    """The segmented-cumsum accumulation (default) must match the K-row
    scatter-add on a randomized synthetic buffer, including rays that cross
    cumsum block boundaries and rays truncated by capacity."""
    rng = np.random.default_rng(7)
    num_rays, capacity, max_spr = 37, 1 << 12, 300
    counts = rng.integers(0, max_spr, size=num_rays).astype(np.int64)
    counts[3] = 0  # empty ray
    ends = np.cumsum(counts)
    starts = ends - counts
    total = int(ends[-1])
    assert total > capacity  # force tail-ray truncation

    slot = np.arange(capacity)
    ray_idx = np.searchsorted(ends, slot, side="right")
    ray_idx = np.minimum(ray_idx, num_rays - 1)
    valid = slot < total
    buf = {
        "ray_idx": jnp.asarray(ray_idx.astype(np.int32)),
        "t_mid": jnp.asarray(
            rng.uniform(0.5, 3.0, capacity).astype(np.float32)
        ),
        "delta": jnp.asarray(
            rng.uniform(0.001, 0.01, capacity).astype(np.float32)
        ),
        "valid": jnp.asarray(valid),
        "ray_first": jnp.asarray(starts.astype(np.int32)),
        "counts": jnp.asarray(counts.astype(np.int32)),
        "total": jnp.int32(total),
    }
    sigma = jnp.asarray(rng.gamma(1.0, 2.0, capacity).astype(np.float32))
    radiance = jnp.asarray(
        rng.uniform(0.0, 1.0, (capacity, 3)).astype(np.float32)
    )
    outs = {}
    for mode in ("cumsum", "scatter"):
        outs[mode] = comp.composite(
            sigma, radiance, buf, num_rays,
            render_bkgd=jnp.asarray([0.2, 0.4, 0.6]),
            early_stop_eps=1e-4, alpha_thre=1e-3,
            max_samples_per_ray=max_spr, accumulate=mode,
        )
    for a, b in zip(outs["cumsum"][:3], outs["scatter"][:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
    assert int(outs["cumsum"][3]) == int(outs["scatter"][3])


def test_composite_cumsum_block_boundary_precision():
    """A ray whose segment straddles a block boundary must get block-local
    precision — its sum must match a float64 oracle closely even when
    earlier rays carry large accumulated magnitudes."""
    num_rays, capacity = 3, 4096
    counts = np.array([2000, 100, 1500], np.int64)  # ray 1 crosses 2048
    ends = np.cumsum(counts)
    starts = ends - counts
    slot = np.arange(capacity)
    ray_idx = np.minimum(
        np.searchsorted(ends, slot, side="right"), num_rays - 1
    )
    rng = np.random.default_rng(3)
    t_mid = rng.uniform(1.0, 2.0, capacity).astype(np.float32)
    buf = {
        "ray_idx": jnp.asarray(ray_idx.astype(np.int32)),
        "t_mid": jnp.asarray(t_mid),
        "delta": jnp.asarray(np.full(capacity, 1e-4, np.float32)),
        "valid": jnp.asarray(slot < int(ends[-1])),
        "ray_first": jnp.asarray(starts.astype(np.int32)),
        "counts": jnp.asarray(counts.astype(np.int32)),
        "total": jnp.int32(int(ends[-1])),
    }
    sigma = jnp.asarray(
        rng.gamma(2.0, 5.0, capacity).astype(np.float32)
    )
    radiance = jnp.asarray(
        rng.uniform(0.0, 1.0, (capacity, 1)).astype(np.float32)
    )
    colors, opacity, depth, _ = comp.composite(
        sigma, radiance, buf, num_rays, early_stop_eps=0.0,
        alpha_thre=0.0, max_samples_per_ray=2048,
    )
    # float64 oracle
    sig = np.asarray(sigma, np.float64)
    dt = np.asarray(buf["delta"], np.float64)
    rad = np.asarray(radiance, np.float64)
    for r in range(num_rays):
        seg = slice(starts[r], ends[r])
        sdt = sig[seg] * dt[seg]
        trans = np.exp(-(np.cumsum(sdt) - sdt))
        w = (1 - np.exp(-sdt)) * trans
        np.testing.assert_allclose(
            float(colors[r, 0]), float(np.sum(w * rad[seg, 0])),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            float(opacity[r]), float(np.sum(w)), rtol=2e-4, atol=2e-5
        )


def test_distortion_sum_matches_bruteforce():
    """ops/composite.py:distortion_sum's O(K) cumsum formulation must match
    the O(K^2) mip-NeRF 360 double sum (arXiv 2111.12077 eq. 15) on a
    randomized ray-major buffer with ascending per-ray t_mid (the marching
    order the compositor guarantees), including empty and 1-sample rays
    (which contribute zero — degenerate span)."""
    rng = np.random.default_rng(11)
    num_rays, capacity = 23, 1 << 12
    counts = rng.integers(0, 220, size=num_rays).astype(np.int64)
    counts[2] = 0   # empty ray
    counts[5] = 1   # single-sample ray: no distortion defined
    ends = np.cumsum(counts)
    starts = ends - counts
    total = int(ends[-1])
    assert total <= capacity
    slot = np.arange(capacity)
    ray_idx = np.minimum(
        np.searchsorted(ends, slot, side="right"), num_rays - 1
    )
    valid = slot < total
    # ascending t within each ray (marching order)
    t_mid = np.zeros(capacity, np.float32)
    delta = rng.uniform(0.002, 0.02, capacity).astype(np.float32)
    for r in range(num_rays):
        seg = slice(starts[r], ends[r])
        t_mid[seg] = np.sort(
            rng.uniform(0.5, 4.0, int(counts[r]))
        ).astype(np.float32)
    weights = rng.uniform(0.0, 0.05, capacity).astype(np.float32)
    weights[~valid] = 0.0
    delta[~valid] = 0.0
    buf = {
        "ray_idx": jnp.asarray(ray_idx.astype(np.int32)),
        "t_mid": jnp.asarray(t_mid),
        "delta": jnp.asarray(delta),
        "valid": jnp.asarray(valid),
        "ray_first": jnp.asarray(starts.astype(np.int32)),
        "counts": jnp.asarray(counts.astype(np.int32)),
        "total": jnp.int32(total),
    }
    got = float(comp.distortion_sum(
        jnp.asarray(weights), buf, jnp.asarray(valid)
    ))
    # float64 brute-force oracle
    want = 0.0
    for r in range(num_rays):
        n = int(counts[r])
        if n < 2:
            continue
        seg = slice(starts[r], ends[r])
        w = weights[seg].astype(np.float64)
        t = t_mid[seg].astype(np.float64)
        span = max(t[-1] - t[0], 1e-12)
        s = (t - t[0]) / span
        ds = delta[seg].astype(np.float64) / span
        want += float(
            np.sum(w[:, None] * w[None, :] * np.abs(s[:, None] - s[None, :]))
            + np.sum(w * w * ds) / 3.0
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_render_rays_distortion_flag():
    """render_rays with compute_distortion=True returns a finite
    non-negative per-valid-ray mean distortion; with the flag off the
    regs entry is exactly zero (no extra cumsum cost)."""
    from robust_e_nerf_tpu.models import fields, nerf as nerf_mod

    occ_spec = make_occ_spec()
    field_spec = fields.build_field_spec("mlp", {
        "net_depth": 1, "net_width": 8, "skip_layer": 4,
        "net_depth_condition": 1, "net_width_condition": 8,
        "hidden_activation": "softplus",
        "density_activation": "shifted_trunc_exp",
        "radiance_activation": "softplus",
        "pos_encoder_max_deg": 2, "view_encoder_max_deg": 1,
        "weight_norm": False,
    }, "aabb", 1, 3)
    march_spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.05,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=128, capacity=512,
    )
    spec = nerf_mod.NerfSpec(
        field=field_spec, occ=occ_spec, march_train=march_spec,
        march_eval=march_spec, render_step_size=0.05, near_plane=None,
        far_plane=None, cone_angle=0.0, early_stop_eps=1e-4,
        alpha_thre=0.0, test_chunk_size=512, render_bkgd=None,
        radiance_dim=1,
    )
    params = {"radiance_field": fields.init_field(
        jax.random.PRNGKey(0), field_spec
    )}
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    origins = jnp.asarray([[-2.0, 0.0, 0.0], [0.0, -2.0, 0.0]],
                          jnp.float32)
    directions = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                             jnp.float32)
    occ = jnp.ones(occ_spec.num_cells, bool)
    valid = jnp.asarray([True, True])
    *_, regs_on = nerf_mod.render_rays(
        params, occ, aabb, origins, directions, valid, spec, march_spec,
        compute_distortion=True,
    )
    *_, regs_off = nerf_mod.render_rays(
        params, occ, aabb, origins, directions, valid, spec, march_spec,
    )
    d = float(regs_on["distortion"])
    assert np.isfinite(d) and d >= 0.0
    assert float(regs_off["distortion"]) == 0.0
