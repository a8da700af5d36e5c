"""Vanilla NeRF MLP field (`nerf.arch: mlp`) — structure + behaviour."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_e_nerf_tpu.models import fields, nerf as nerf_mod

ARCH_CONFIG = {  # configs/train/synthetic.yaml:85-96
    "net_depth": 4,          # shrunk from 8 for test speed
    "net_width": 64,
    "skip_layer": 2,
    "net_depth_condition": 1,
    "net_width_condition": 32,
    "hidden_activation": "softplus",
    "density_activation": "shifted_trunc_exp",
    "radiance_activation": "softplus",
    "pos_encoder_max_deg": 6,
    "view_encoder_max_deg": 4,
    "weight_norm": False,
}


def build():
    spec = fields.build_field_spec("mlp", ARCH_CONFIG, "aabb",
                                   radiance_dim=1)
    params = fields.init_field(jax.random.PRNGKey(0), spec)
    return spec, params


def test_shapes_and_selector(rng):
    spec, params = build()
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (32, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radiance, density = fields.field_apply(params, x, d, aabb, spec)
    assert radiance.shape == (32, 1) and density.shape == (32, 1)
    assert np.all(np.asarray(density) >= 0)
    assert np.all(np.asarray(radiance) >= 0)  # softplus radiance
    out = fields.field_query_density(
        params, jnp.asarray([[3.0, 0.0, 0.0]]), aabb, spec
    )
    assert float(out[0, 0]) == 0.0  # out-of-bounds zeroed


def test_skip_connection_structure():
    spec, params = build()
    # layer 0: pos-enc input; layer 2 output gets the input concatenated,
    # so layer 3's fan-in = width + input_dim (external/mlp.py:56-69)
    trunk = params["trunk"]["hidden"]
    input_dim = spec.trunk.input_dim
    assert trunk[0]["w"].shape[0] == input_dim
    assert trunk[3]["w"].shape[0] == 64 + input_dim


def test_view_dependence(rng):
    spec, params = build()
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.zeros((1, 3), jnp.float32)
    d1 = jnp.asarray([[1.0, 0.0, 0.0]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0]])
    r1, s1 = fields.field_apply(params, x, d1, aabb, spec)
    r2, s2 = fields.field_apply(params, x, d2, aabb, spec)
    # density is view-independent, radiance is view-dependent
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_depth_z_conversion():
    depth = jnp.asarray([2.0])
    # ray at 60 degrees from the principal axis
    direction = jnp.asarray([[np.sin(np.pi / 3), 0.0, np.cos(np.pi / 3)]])
    rot = jnp.eye(3)[None]
    z = nerf_mod.ray_distance_to_z_depth(depth, direction, rot)
    np.testing.assert_allclose(float(z[0]), 2.0 * np.cos(np.pi / 3),
                               rtol=1e-6)


def test_gradients_flow(rng):
    spec, params = build()
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def loss(p):
        r, s = fields.field_apply(p, x, d, aabb, spec)
        return jnp.sum(r) + jnp.sum(s)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)
