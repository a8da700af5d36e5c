"""Vanilla NeRF MLP field (`nerf.arch: mlp`) — structure + behaviour."""

import os
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


def test_mlp_density_survives_with_l1_diff_loss(tmp_path_factory):
    """Round-4 finding (docs/diagnostics/r4_mlp_*.log): with the default
    mse diff error the early variance-reduction gradient coherently
    crushes the vanilla MLP's density to zero (the smooth global basis
    cannot decouple per-region density, unlike the hash grid), after
    which Adam coasting drives trunc_exp raw values to -45 and the
    recovery overshoot NaNs; with l1 (reference surface, loss.py:26-30)
    the sign-based gradient is incoherent while predictions are
    uncorrelated with targets and the field stays alive.  This pins the
    mechanism at test scale: after the same number of steps the l1 run's
    peak density must exceed the mse run's by orders of magnitude."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_engine import dataset as _dsfix  # noqa: F401  (fixture)
    from robust_e_nerf_tpu.data import synthetic
    from robust_e_nerf_tpu.engine.trainer import Trainer
    from test_engine import tiny_config

    out = str(tmp_path_factory.mktemp("mlp_dyn_ds"))
    synthetic.generate_dataset(
        out, img_width=24, img_height=24, duration_s=2.0,
        num_pose_samples=41, num_sim_frames=81, num_train_views=2,
        num_val_views=2, num_test_views=2,
    )

    def peak_sigma(diff_fn, weight):
        tmp = tmp_path_factory.mktemp(f"mlp_dyn_{diff_fn}")
        cfg = tiny_config(
            out, tmp,
            **{
                "model.nerf.arch": "mlp",
                "optimizer.lr.default": 1e-3,
                "loss.error_fn.log_intensity_diff": diff_fn,
                "loss.param_weight.log_intensity_diff": weight,
                "trainer.limit_train_batches": 48,
                "trainer.check_val_every_n_epoch": 100,
            },
        )
        cfg["trainer"]["logger"] = False
        cfg["trainer"]["checkpoint_callback"] = False
        trainer = Trainer(cfg, logging_enabled=False)
        trainer.fit()
        pts = jnp.asarray(
            np.random.default_rng(3).uniform(-1.0, 1.0, (512, 3)),
            jnp.float32,
        )
        sigma = fields.field_query_density(
            trainer.params["nerf"]["radiance_field"], pts,
            trainer.buffers["aabb"], trainer.spec.nerf.field,
        )
        return float(jnp.max(sigma))

    sig_l1 = peak_sigma("l1", "mean_contrast_reciprocal")
    sig_mse = peak_sigma("mse", "mean_contrast_reciprocal_sq")
    # at full scale the separation is ~15 orders of magnitude within 64
    # steps (diag logs: sigma ~4 alive vs ~1e-15 crushed); at this test
    # scale (48 steps, 2^14 budget, 24x24 scene, deterministic seeds) the
    # crush is still in progress — assert the direction with the
    # measured margins (l1 2.59 vs mse 1.08)
    assert sig_l1 > 1.5 * max(sig_mse, 1e-30)
    assert sig_l1 > 1.0
