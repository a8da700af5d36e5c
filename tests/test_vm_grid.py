"""VM-factorized grid encoding (the TPU-native fast field)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import fields
from robust_e_nerf_tpu.ops import vm_grid

CFG = {"resolution": 16, "line_resolution": 12, "n_components": 4}


def test_meta_and_shapes(rng):
    meta = vm_grid.build_meta(CFG)
    assert meta.output_dim == 12
    params = vm_grid.init_params(jax.random.PRNGKey(0), meta)
    assert params["planes"].shape == (3, 256, 4)
    assert params["lines"].shape == (3, 12, 4)
    x = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
    out = vm_grid.encode(params, x, meta)
    assert out.shape == (32, 12)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bilinear_interp_matches_manual(rng):
    meta = vm_grid.build_meta(CFG)
    res = meta.resolution
    table = jnp.asarray(rng.normal(size=(res * res, 4)).astype(np.float32))
    u = jnp.asarray([0.37], jnp.float32)
    v = jnp.asarray([0.81], jnp.float32)
    out = np.asarray(vm_grid._interp_2d(table, u, v, res))[0]
    pu, pv = 0.37 * (res - 1), 0.81 * (res - 1)
    u0, v0 = int(np.floor(pu)), int(np.floor(pv))
    wu, wv = pu - u0, pv - v0
    t = np.asarray(table).reshape(res, res, 4)
    expected = (
        t[u0, v0] * (1 - wu) * (1 - wv) + t[u0, v0 + 1] * (1 - wu) * wv
        + t[u0 + 1, v0] * wu * (1 - wv) + t[u0 + 1, v0 + 1] * wu * wv
    )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_encode_is_product_of_plane_and_line(rng):
    """With a constant line of value 2, features = 2 * plane interp."""
    meta = vm_grid.build_meta(CFG)
    params = vm_grid.init_params(jax.random.PRNGKey(1), meta)
    params["lines"] = jnp.full_like(params["lines"], 2.0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))
    out = np.asarray(vm_grid.encode(params, x, meta))
    plane0 = np.asarray(
        vm_grid._interp_2d(params["planes"][0], x[:, 0], x[:, 1],
                           meta.resolution)
    )
    # paired-row encode reassociates the bilinear sum -> ~1 ulp vs oracle
    np.testing.assert_allclose(out[:, :4], 2.0 * plane0, rtol=1e-5,
                               atol=1e-7)


def test_gradients_and_jvp(rng):
    meta = vm_grid.build_meta(CFG)
    params = vm_grid.init_params(jax.random.PRNGKey(2), meta)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (16, 3)).astype(np.float32))

    def loss(p):
        return jnp.sum(jnp.sin(vm_grid.encode(p, x, meta)))

    grads = jax.grad(loss)(params)
    assert np.any(np.asarray(grads["planes"]) != 0)
    assert np.any(np.asarray(grads["lines"]) != 0)

    # forward-mode w.r.t. positions (the l_grad path); place samples away
    # from grid-cell boundaries so finite differences stay in one cell
    meta16 = vm_grid.build_meta(
        {"resolution": 16, "line_resolution": 16, "n_components": 4}
    )
    params16 = vm_grid.init_params(jax.random.PRNGKey(5), meta16)
    cells = rng.integers(0, 15, size=(16, 3))
    frac = rng.uniform(0.3, 0.7, size=(16, 3))
    x16 = jnp.asarray(((cells + frac) / 15.0).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    f = lambda p: vm_grid.encode(params16, p, meta16)  # noqa: E731
    _, tangent = jax.jvp(f, (x16,), (v,))
    eps = 1e-3
    fd = (f(x16 + eps * v) - f(x16 - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(tangent), np.asarray(fd),
                               atol=2e-2)


def test_tensorf_field_arch(rng):
    """Full tensorf field through the arch dispatch."""
    arch_config = {
        "vm_grid": CFG,
        "dir_encoding": {"degree": 4},
        "mlp_base": {
            "hidden_activation": "softplus",
            "density_activation": "shifted_trunc_exp",
            "n_neurons": 32, "n_hidden_layers": 1, "geo_feat_dim": 15,
        },
        "mlp_head": {
            "hidden_activation": "softplus",
            "radiance_activation": "softplus",
            "n_neurons": 32, "n_hidden_layers": 2,
        },
    }
    spec = fields.build_field_spec(
        "tensorf", arch_config, "aabb", radiance_dim=1
    )
    params = fields.init_field(jax.random.PRNGKey(3), spec)
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radiance, density = fields.field_apply(params, x, d, aabb, spec)
    assert radiance.shape == (64, 1)
    assert density.shape == (64, 1)
    assert np.all(np.asarray(density) >= 0)
    # out-of-bounds density is zeroed by the selector
    x_out = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
    density_out = fields.field_query_density(params, x_out, aabb, spec)
    assert float(density_out[0, 0]) == 0.0


def test_tensorf_can_fit_a_density_bump(rng):
    """A few Adam steps should fit a simple target — sanity that gradients
    are useful, not just nonzero."""
    import optax

    meta = vm_grid.build_meta(CFG)
    params = vm_grid.init_params(jax.random.PRNGKey(4), meta)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (256, 3)).astype(np.float32))
    target = jnp.sin(4 * x[:, 0]) * jnp.cos(3 * x[:, 1]) + x[:, 2]

    def loss_fn(p):
        feats = vm_grid.encode(p, x, meta)
        return jnp.mean((jnp.sum(feats, axis=-1) - target) ** 2)

    opt = optax.adam(2e-2)
    state = opt.init(params)
    loss0 = float(loss_fn(params))
    for _ in range(60):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < 0.3 * loss0


def test_quad_packed_plane_matches_direct(rng):
    """_interp_2d_quad (1 gather) == _interp_2d (4 gathers) exactly up to
    fp reassociation, including cells at the grid borders."""
    meta = vm_grid.build_meta(CFG)
    params = vm_grid.init_params(jax.random.PRNGKey(9), meta)
    # include exact-corner and border positions
    x = np.concatenate([
        rng.uniform(0, 1, (64, 2)),
        [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
    ]).astype(np.float32)
    u, v = jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1])
    plane = params["planes"][0]
    direct = np.asarray(
        vm_grid._interp_2d(plane, u, v, meta.resolution)
    )
    quad = np.asarray(vm_grid._interp_2d_quad(
        vm_grid._quad_rows(plane, meta.resolution), u, v,
        meta.resolution, meta.n_components,
    ))
    np.testing.assert_allclose(quad, direct, rtol=1e-5, atol=1e-7)


def test_line_matmul_matches_gather_lerp():
    """The soft-one-hot matmul line interpolation must reproduce the
    gather-based lerp exactly (fwd + coord jvp; table grad to fp sum
    order)."""
    import jax

    table = jax.random.normal(jax.random.PRNGKey(0), (512, 16))
    coord = jax.random.uniform(jax.random.PRNGKey(1), (4096,))
    a = vm_grid._interp_1d(table, coord, 512)
    b = vm_grid._interp_1d_matmul(table, coord, 512)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ga = jax.grad(lambda t: vm_grid._interp_1d(t, coord, 512).sum())(table)
    gb = jax.grad(
        lambda t: vm_grid._interp_1d_matmul(t, coord, 512).sum()
    )(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=5e-6)
    ja = jax.jvp(lambda c: vm_grid._interp_1d(table, c, 512), (coord,),
                 (jnp.ones_like(coord),))[1]
    jb = jax.jvp(lambda c: vm_grid._interp_1d_matmul(table, c, 512),
                 (coord,), (jnp.ones_like(coord),))[1]
    np.testing.assert_allclose(np.asarray(ja), np.asarray(jb), atol=5e-6)
