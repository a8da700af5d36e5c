"""contract_coords must match the stacked `contract` exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import contraction as c

AABB = np.array([-1.5, -2.0, -0.5, 1.5, 2.0, 3.5], dtype=np.float32)


@pytest.mark.parametrize("ctype", [c.AABB, c.SPHERE, c.TANH])
def test_coords_matches_stacked(rng, ctype):
    x = rng.uniform(-10, 10, size=(64, 32, 3)).astype(np.float32)
    stacked = np.asarray(
        c.contract(jnp.asarray(x), jnp.asarray(AABB), ctype)
    )
    cx, cy, cz = c.contract_coords(
        jnp.asarray(x[..., 0]), jnp.asarray(x[..., 1]),
        jnp.asarray(x[..., 2]), jnp.asarray(AABB), ctype,
    )
    coords = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(cz)],
                      axis=-1)
    np.testing.assert_allclose(coords, stacked, atol=2e-6)
