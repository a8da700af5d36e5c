"""Space contractions vs the spec (external/ngp.py:68-106) and inverse
round-trips (needed by the occupancy grid's cell placement)."""

import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import contraction as c

AABB = np.array([-1.5, -2.0, -0.5, 1.5, 2.0, 3.5], dtype=np.float32)


def reference_unisphere(x, aabb):
    """Direct numpy transcription of the published mip-NeRF-360 style
    contraction the reference uses (spec at ngp.py:68-93)."""
    lo, hi = aabb[:3], aabb[3:]
    x = (x - lo) / (hi - lo)
    x = x * 2 - 1
    mag = np.linalg.norm(x, axis=-1, keepdims=True)
    out = np.where(mag > 1, (2 - 1 / mag) * (x / mag), x)
    return out / 4 + 0.5


def test_aabb_contraction_roundtrip(rng):
    x = rng.uniform(-5, 5, size=(128, 3)).astype(np.float32)
    u = c.contract(jnp.asarray(x), jnp.asarray(AABB), c.AABB)
    back = c.contract_inv(u, jnp.asarray(AABB), c.AABB)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-5)
    # inside the box maps inside [0, 1]
    inside = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    world = AABB[:3] + inside * (AABB[3:] - AABB[:3])
    u2 = np.asarray(c.contract(jnp.asarray(world), jnp.asarray(AABB), c.AABB))
    assert np.all((u2 >= -1e-6) & (u2 <= 1 + 1e-6))


def test_unisphere_matches_reference_math(rng):
    x = rng.uniform(-20, 20, size=(256, 3)).astype(np.float32)
    ours = np.asarray(c.contract(jnp.asarray(x), jnp.asarray(AABB), c.SPHERE))
    expected = reference_unisphere(x, AABB)
    np.testing.assert_allclose(ours, expected, atol=1e-5)
    assert np.all((ours >= 0) & (ours <= 1))


def test_unisphere_inverse_roundtrip(rng):
    x = rng.uniform(-8, 8, size=(256, 3)).astype(np.float32)
    u = c.contract(jnp.asarray(x), jnp.asarray(AABB), c.SPHERE)
    back = np.asarray(c.contract_inv(u, jnp.asarray(AABB), c.SPHERE))
    np.testing.assert_allclose(back, x, rtol=2e-3, atol=2e-3)


def test_tanh_matches_reference_math(rng):
    x = rng.uniform(-20, 20, size=(256, 3)).astype(np.float32)
    lo, hi = AABB[:3], AABB[3:]
    xn = (x - lo) / (hi - lo) - 0.5
    expected = (np.tanh(xn) + 1) / 2
    ours = np.asarray(c.contract(jnp.asarray(x), jnp.asarray(AABB), c.TANH))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_tanh_inverse_roundtrip(rng):
    x = rng.uniform(-3, 3, size=(128, 3)).astype(np.float32)
    u = c.contract(jnp.asarray(x), jnp.asarray(AABB), c.TANH)
    back = np.asarray(c.contract_inv(u, jnp.asarray(AABB), c.TANH))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ctype", [c.AABB, c.SPHERE, c.TANH])
def test_contraction_finite_everywhere(rng, ctype):
    x = rng.uniform(-100, 100, size=(64, 3)).astype(np.float32)
    u = np.asarray(c.contract(jnp.asarray(x), jnp.asarray(AABB), ctype))
    assert np.all(np.isfinite(u))
