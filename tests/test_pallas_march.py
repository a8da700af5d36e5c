"""Pallas fused march kernel vs the XLA reference path (interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import contraction, occupancy
from robust_e_nerf_tpu.ops import ray_march
from robust_e_nerf_tpu.ops.pallas import march_kernel

AABB = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)


def make_setup(rng, num_rays=64, res=32, occupied_frac=0.1):
    occ_spec = occupancy.build_spec(
        {"resolution": res, "occ_thre": 0.01, "ema_decay": 0.95,
         "warmup_steps": 1, "n": 1},
        contraction.AABB,
    )
    binary = jnp.asarray(rng.random(occ_spec.num_cells) < occupied_frac)
    o = rng.normal(size=(num_rays, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return occ_spec, binary, jnp.asarray(o), jnp.asarray(d)


def test_pack_occupancy_roundtrip(rng):
    res = (32, 32, 32)
    binary = jnp.asarray(rng.random(32**3) < 0.3)
    planes = march_kernel.pack_occupancy(binary, res)
    assert len(planes) == 4
    assert all(np.asarray(p).max() <= 255 for p in planes)
    words = sum(
        np.asarray(p).astype(np.uint32).reshape(-1) << (8 * j)
        for j, p in enumerate(planes)
    )
    cells = np.arange(32**3)
    bits = (words[cells >> 5] >> (cells & 31)) & 1
    np.testing.assert_array_equal(bits.astype(bool), np.asarray(binary))


@pytest.mark.parametrize("ctype", [contraction.AABB, contraction.SPHERE])
def test_kernel_matches_xla_path(rng, ctype):
    occ_spec, binary, o, d = make_setup(rng)
    near, far = (0.5, 6.0) if ctype != contraction.AABB else (None, None)
    spec_xla = ray_march.MarchSpec(
        contraction_type=ctype, render_step_size=0.02,
        near_plane=near, far_plane=far, cone_angle=0.0,
        max_samples_per_ray=256, capacity=4096, use_pallas=False,
    )
    occ_spec = dataclasses.replace(occ_spec, contraction_type=ctype)
    spec_pl = dataclasses.replace(spec_xla, use_pallas=True)
    valid = jnp.ones((o.shape[0],), bool)
    key = jax.random.PRNGKey(7)
    aabb = jnp.asarray(AABB)
    buf_xla = ray_march.march_and_compact(
        o, d, valid, binary, aabb, occ_spec, spec_xla, key=key
    )
    buf_pl = ray_march.march_and_compact(
        o, d, valid, binary, aabb, occ_spec, spec_pl, key=key
    )
    assert int(buf_pl["total"]) == int(buf_xla["total"])
    np.testing.assert_array_equal(np.asarray(buf_pl["counts"]),
                                  np.asarray(buf_xla["counts"]))
    np.testing.assert_array_equal(np.asarray(buf_pl["ray_idx"]),
                                  np.asarray(buf_xla["ray_idx"]))
    np.testing.assert_allclose(np.asarray(buf_pl["t_mid"]),
                               np.asarray(buf_xla["t_mid"]), atol=1e-5)


def test_kernel_respects_ray_validity(rng):
    occ_spec, binary, o, d = make_setup(rng)
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.02,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=256, capacity=4096, use_pallas=True,
    )
    valid = jnp.asarray(rng.random(o.shape[0]) < 0.5)
    buf = ray_march.march_and_compact(
        o, d, valid, binary, jnp.asarray(AABB), occ_spec, spec,
        key=jax.random.PRNGKey(1),
    )
    counts = np.asarray(buf["counts"])
    assert np.all(counts[~np.asarray(valid)] == 0)


def test_fallback_when_shapes_unsupported(rng):
    """Odd ray counts / sample counts silently use the XLA path."""
    occ_spec, binary, o, d = make_setup(rng, num_rays=48)
    spec = ray_march.MarchSpec(
        contraction_type=contraction.AABB, render_step_size=0.02,
        near_plane=None, far_plane=None, cone_angle=0.0,
        max_samples_per_ray=250, capacity=4096, use_pallas=True,
    )
    buf = ray_march.march_and_compact(
        o, d, jnp.ones((48,), bool), binary, jnp.asarray(AABB), occ_spec,
        spec, key=None,
    )
    assert int(buf["total"]) > 0
