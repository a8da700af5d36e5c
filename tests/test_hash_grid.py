"""Multiresolution grid encoding: semantics + gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_e_nerf_tpu.ops import hash_grid

REFERENCE_CFG = {  # configs/train/synthetic.yaml:62-69
    "otype": "HashGrid",
    "n_levels": 16,
    "n_features_per_level": 2,
    "log2_hashmap_size": 19,
    "base_resolution": 16,
    "per_level_scale": 1.4472692012786865,
    "interpolation": "Linear",
}


def test_meta_reference_config():
    meta = hash_grid.build_meta(REFERENCE_CFG)
    assert meta.n_levels == 16
    assert meta.output_dim == 32
    assert meta.resolutions[0] == 16
    # resolutions grow ~1.447x per level
    for a, b in zip(meta.resolutions[:-1], meta.resolutions[1:]):
        assert b > a
    # coarse levels are dense, fine levels hashed at 2**19 entries
    assert not meta.hashed[0]
    assert meta.hashed[-1]
    assert meta.sizes[-1] == 2**19
    # per-level storage offsets are cumulative
    assert meta.total_entries == sum(meta.sizes)


def test_dense_level_is_trilinear_interpolation(rng):
    """A single dense level must reproduce plain trilinear interpolation of
    the table (tcnn: pos = x * scale + 0.5, scale = res - 1)."""
    cfg = dict(REFERENCE_CFG, n_levels=1, base_resolution=8,
               otype="DenseGrid")
    meta = hash_grid.build_meta(cfg)
    res = meta.resolutions[0]
    assert res == 8
    table = rng.normal(size=(meta.total_entries, 2)).astype(np.float32)
    x = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    out = np.asarray(hash_grid.encode(jnp.asarray(table), jnp.asarray(x),
                                      meta))

    scale = meta.base_resolution * meta.per_level_scale**0 - 1.0
    p = x * scale + 0.5
    p0 = np.floor(p).astype(np.int64)
    w = p - p0
    expected = np.zeros((64, 2), np.float32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                idx = (
                    (p0[:, 0] + cx)
                    + (p0[:, 1] + cy) * res
                    + (p0[:, 2] + cz) * res * res
                )
                wc = (
                    (w[:, 0] if cx else 1 - w[:, 0])
                    * (w[:, 1] if cy else 1 - w[:, 1])
                    * (w[:, 2] if cz else 1 - w[:, 2])
                )
                expected += wc[:, None] * table[idx]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_hashed_level_consistency(rng):
    """Same position -> same features; nearby positions interpolate
    continuously across a cell boundary."""
    meta = hash_grid.build_meta(dict(REFERENCE_CFG, n_levels=16))
    key = jax.random.PRNGKey(0)
    table = hash_grid.init_table(key, meta)
    x = jnp.asarray(rng.uniform(0, 1, size=(16, 3)).astype(np.float32))
    a = hash_grid.encode(table, x, meta)
    b = hash_grid.encode(table, x, meta)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continuity: tiny perturbation -> tiny feature change
    eps = 1e-6
    c = hash_grid.encode(table, x + eps, meta)
    assert np.max(np.abs(np.asarray(c) - np.asarray(a))) < 1e-2


def test_gradient_scatter_matches_numerical(rng):
    """d(loss)/d(table) via autodiff vs finite differences on a few
    entries — validates the scatter-add backward through the gather."""
    cfg = dict(REFERENCE_CFG, n_levels=2, base_resolution=4,
               log2_hashmap_size=6)
    meta = hash_grid.build_meta(cfg)
    table = jnp.asarray(
        rng.normal(size=(meta.total_entries, 2)).astype(np.float32)
    )
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 3)).astype(np.float32))

    def loss(t):
        return jnp.sum(jnp.sin(hash_grid.encode(t, x, meta)))

    grad = np.asarray(jax.grad(loss)(table))
    eps = 1e-3
    for entry in [(0, 0), (5, 1), (17, 0)]:
        tp = table.at[entry].add(eps)
        tm = table.at[entry].add(-eps)
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        np.testing.assert_allclose(grad[entry], fd, rtol=1e-2, atol=1e-4)


def test_jvp_through_positions(rng):
    """Forward-mode tangent w.r.t. positions must exist (l_grad path) and
    match finite differences."""
    meta = hash_grid.build_meta(dict(REFERENCE_CFG, n_levels=4))
    table = hash_grid.init_table(jax.random.PRNGKey(1), meta)
    x = jnp.asarray(rng.uniform(0.2, 0.8, size=(4, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))

    f = lambda p: hash_grid.encode(table, p, meta)  # noqa: E731
    _, tangent = jax.jvp(f, (x,), (v,))
    eps = 1e-4
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(tangent), np.asarray(fd), atol=1e-3
    )


def test_tiled_grid_wraps(rng):
    cfg = dict(REFERENCE_CFG, n_levels=8, otype="TiledGrid",
               log2_hashmap_size=10)
    meta = hash_grid.build_meta(cfg)
    assert max(meta.sizes) <= 2**10
    table = hash_grid.init_table(jax.random.PRNGKey(2), meta)
    x = jnp.asarray(rng.uniform(0, 1, size=(8, 3)).astype(np.float32))
    out = hash_grid.encode(table, x, meta)
    assert np.all(np.isfinite(np.asarray(out)))


def test_encode_batched_matches_scan(rng):
    """encode_batched (single fused gather across levels) is value-
    identical to the scan encode.  Measured on v5e it is ~20% slower
    (docs/PERFORMANCE.md) and is kept as the documented negative result."""
    import jax

    from robust_e_nerf_tpu.ops import hash_grid

    meta = hash_grid.build_meta({
        "otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
        "log2_hashmap_size": 12, "base_resolution": 16,
        "per_level_scale": 1.4472692012786865, "interpolation": "Linear",
    })
    table = hash_grid.init_table(jax.random.PRNGKey(0), meta)
    x = jax.random.uniform(jax.random.PRNGKey(1), (311, 3))
    a = np.asarray(hash_grid.encode(table, x, meta))
    b = np.asarray(hash_grid.encode_batched(table, x, meta))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_packed_dense_levels_bit_exact_with_per_corner(rng):
    """The packed-footprint fast path must be BIT-exact with a per-corner
    gather implementation on dense levels, including positions in the top
    boundary half-cell (where the +1 corner's strided index runs past the
    level, which the flat-shift slices reproduce by construction)."""
    meta = hash_grid.build_meta(REFERENCE_CFG)
    table = hash_grid.init_table(jax.random.PRNGKey(3), meta)

    n = 512
    x = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    # force some samples into every level's top boundary half-cell
    x = x.at[:64].set(
        1.0 - jax.random.uniform(jax.random.PRNGKey(5), (64, 3)) * 1e-3
    )

    got = hash_grid.encode(table, x, meta)

    # per-corner oracle: one level at a time through the generic math
    corners = np.stack(
        np.meshgrid(*([np.arange(2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(np.uint32)
    want = []
    for level in range(meta.n_levels):
        scale = meta.base_resolution * meta.per_level_scale**level - 1.0
        p = np.asarray(x, np.float32) * np.float32(scale) + 0.5
        p0 = np.floor(p)
        w = (p - p0).astype(np.float32)
        p0 = np.clip(p0, 0.0, None).astype(np.uint32)
        cc = p0[:, None, :] + corners[None]  # (N, 8, 3)
        res = np.uint32(meta.resolutions[level])
        if meta.hashed[level]:
            idx = (cc[..., 0] * np.uint32(1)
                   ^ cc[..., 1] * np.uint32(2654435761)
                   ^ cc[..., 2] * np.uint32(805459861))
            idx &= np.uint32(meta.sizes[level] - 1)
        else:
            idx = cc[..., 0] + cc[..., 1] * res + cc[..., 2] * res * res
        rows = np.asarray(table)[
            np.minimum(meta.offsets[level] + idx, meta.total_entries - 1)
        ]  # (N, 8, F)
        weights = np.prod(
            corners[None].astype(np.float32) * w[:, None, :]
            + (1.0 - corners[None]) * (1.0 - w[:, None, :]),
            axis=-1, dtype=np.float32,
        )
        want.append(np.einsum("nc,ncf->nf", weights, rows))
    want = np.concatenate(want, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


def test_table_read_dtype_bf16():
    """Opt-in bf16 table reads: encode matches the f32 path to bf16
    tolerance, and the table gradient stays f32 (f32 scatter
    accumulation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_e_nerf_tpu.ops import hash_grid as hg

    base_cfg = {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.5,
    }
    meta32 = hg.build_meta(base_cfg)
    meta16 = hg.build_meta({**base_cfg, "table_read_dtype": "bfloat16"})
    table = hg.init_table(jax.random.PRNGKey(0), meta32) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

    f32 = hg.encode(table, x, meta32)
    f16 = hg.encode(table, x, meta16)
    assert f16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(f32), np.asarray(f16),
                               rtol=2e-2, atol=2e-2)

    g = jax.grad(lambda t: jnp.sum(jnp.sin(hg.encode(t, x, meta16))))(
        table
    )
    assert g.dtype == jnp.float32
    g32 = jax.grad(lambda t: jnp.sum(jnp.sin(hg.encode(t, x, meta32))))(
        table
    )
    # gradients agree to bf16 forward tolerance
    denom = np.maximum(np.abs(np.asarray(g32)), 1e-2)
    rel = np.abs(np.asarray(g) - np.asarray(g32)) / denom
    assert float(np.median(rel)) < 0.05
