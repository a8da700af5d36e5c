"""Optimizer assembly: 4-group labels, lr schedule, freezing, weight decay."""

import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.engine import optimizers as opt_mod


def fake_params():
    return {
        "contrast_threshold": {"raw_p2n_ratio": jnp.zeros(())},
        "refractory_period": {"raw_tau": jnp.zeros(())},
        "nerf": {
            "radiance_field": {
                "hash": {"table": jnp.zeros((16, 2))},
                "mlp_base": {"hidden": [{"w": jnp.zeros((4, 4)),
                                         "b": jnp.zeros(4)}]},
                "mlp_head": {"output": {"w": jnp.zeros((4, 1)),
                                        "b": jnp.zeros(1)}},
            },
            "render_bkgd_raw": jnp.zeros((1,)),
        },
    }


def base_config(freeze_ct=True, freeze_tau=True, freeze_nerf=False):
    return {
        "optimizer": {
            "algo": "adam",
            "lr": {"contrast_threshold": 0.1, "default": 0.01},
            "relative_lr": {"refractory_period": 50},
        },
        "lr_scheduler": {
            "algo": "multi_step_lr",
            "interval": "epoch",
            "multi_step_lr": {"milestones": [20, 30, 36], "gamma": 0.33},
        },
        "loss": {"weight": {"nerf_mlp_weight_decay": 1e-6}},
        "model": {
            "contrast_threshold": {"freeze": freeze_ct},
            "refractory_period": {"freeze": freeze_tau},
            "nerf": {"freeze": freeze_nerf},
        },
    }


def test_label_assignment():
    params = fake_params()
    labels = opt_mod.label_params(
        params,
        {"contrast_threshold": False, "refractory_period": False,
         "nerf": False},
    )
    assert labels["contrast_threshold"]["raw_p2n_ratio"] == opt_mod.GROUP_CT
    assert labels["refractory_period"]["raw_tau"] == opt_mod.GROUP_TAU
    # the hash table is in the weight-decay group — the reference's
    # "nerf.radiance_field.mlp" prefix includes the tcnn encoding inside
    # mlp_base (robust_e_nerf.py:786-789)
    rf = labels["nerf"]["radiance_field"]
    assert rf["hash"]["table"] == opt_mod.GROUP_NERF_MLP
    assert rf["mlp_base"]["hidden"][0]["w"] == opt_mod.GROUP_NERF_MLP
    assert rf["mlp_head"]["output"]["b"] == opt_mod.GROUP_NERF_MLP
    assert labels["nerf"]["render_bkgd_raw"] == opt_mod.GROUP_OTHER


def test_frozen_labels():
    params = fake_params()
    labels = opt_mod.label_params(
        params,
        {"contrast_threshold": True, "refractory_period": True,
         "nerf": True},
    )
    assert labels["contrast_threshold"]["raw_p2n_ratio"] == \
        opt_mod.GROUP_FROZEN
    assert labels["nerf"]["radiance_field"]["hash"]["table"] == \
        opt_mod.GROUP_FROZEN


def test_multi_step_lr_factor():
    factor = opt_mod.multi_step_lr_factor([20, 30, 36], 0.33, 1000)
    assert factor(0) == 1.0
    assert factor(19_999) == 1.0
    assert factor(20_000) == pytest.approx(0.33)
    assert factor(30_000) == pytest.approx(0.33**2)
    assert factor(36_000) == pytest.approx(0.33**3)


def test_frozen_params_receive_zero_updates():
    params = fake_params()
    optimizer, _ = opt_mod.build_optimizer(
        base_config(freeze_ct=True, freeze_tau=True), params,
        max_refractory_period_s=1e-6, steps_per_epoch=10,
    )
    import jax

    state = optimizer.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = optimizer.update(grads, state, params)
    assert float(updates["contrast_threshold"]["raw_p2n_ratio"]) == 0.0
    assert float(updates["refractory_period"]["raw_tau"]) == 0.0
    # nerf params do update
    assert np.any(
        np.asarray(updates["nerf"]["radiance_field"]["hash"]["table"])
        != 0.0
    )


def test_torch_adam_first_step_magnitude():
    """torch Adam's first update is exactly -lr * sign-ish grad/(sqrt(v)+eps)
    with bias correction — for a constant grad of 1 the first step is
    ~= -lr."""
    params = fake_params()
    optimizer, _ = opt_mod.build_optimizer(
        base_config(freeze_ct=False, freeze_tau=False), params,
        max_refractory_period_s=2e-6, steps_per_epoch=10,
    )
    state = optimizer.init(params)
    import jax

    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = optimizer.update(grads, state, params)
    assert float(updates["contrast_threshold"]["raw_p2n_ratio"]) == \
        pytest.approx(-0.1, rel=1e-4)
    # tau lr = max_tau * relative_lr = 2e-6 * 50 = 1e-4
    assert float(updates["refractory_period"]["raw_tau"]) == \
        pytest.approx(-1e-4, rel=1e-4)
    assert float(
        updates["nerf"]["radiance_field"]["mlp_base"]["hidden"][0]["w"][0, 0]
    ) == pytest.approx(-0.01, rel=1e-3)
