"""Reference-checkpoint converter: round-trip against our param trees.

The torch-side names are cited from the reference sources in
scripts/convert_reference_ckpt.py's docstring; here we synthesize a
state dict with those names from a known parameter tree, convert, and
check the result restores bit-identically through the standard
component-load path.
"""

import numpy as np
import pytest
import torch

import jax

from robust_e_nerf_tpu.engine import checkpoint as ckpt_mod
from robust_e_nerf_tpu.models import fields, occupancy
from robust_e_nerf_tpu.utils import pytree

from scripts.convert_reference_ckpt import convert_state_dict

NGP_CFG = {
    "pos_encoding": {
        "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.5, "interpolation": "Linear",
    },
    "dir_encoding": {"degree": 2},
    "mlp_base": {
        "hidden_activation": "softplus",
        "density_activation": "shifted_trunc_exp", "n_neurons": 16,
        "n_hidden_layers": 1, "geo_feat_dim": 7, "weight_norm": False,
    },
    "mlp_head": {
        "hidden_activation": "softplus", "radiance_activation": "softplus",
        "n_neurons": 16, "n_hidden_layers": 2, "weight_norm": False,
    },
}


def _torch_mlp_entries(sd, prefix, mlp_params):
    for i, layer in enumerate(mlp_params["hidden"]):
        sd[f"{prefix}.hidden_layers.{i}.weight"] = torch.tensor(
            np.asarray(layer["w"]).T
        )
        sd[f"{prefix}.hidden_layers.{i}.bias"] = torch.tensor(
            np.asarray(layer["b"])
        )
    if "output" in mlp_params:
        sd[f"{prefix}.output_layer.weight"] = torch.tensor(
            np.asarray(mlp_params["output"]["w"]).T
        )
        sd[f"{prefix}.output_layer.bias"] = torch.tensor(
            np.asarray(mlp_params["output"]["b"])
        )


def test_ngp_checkpoint_round_trip():
    spec = fields.build_field_spec("ngp", NGP_CFG, "aabb", 1, 3)
    want_rf = fields.init_field(jax.random.PRNGKey(0), spec)

    sd = {
        "contrast_threshold.parametrizations."
        "p2n_contrast_threshold_ratio.original": torch.tensor([0.3]),
        "refractory_period.parametrizations."
        "_refractory_period.original": torch.tensor(
            [-2.5], dtype=torch.float64
        ),
        "nerf.parametrizations.render_bkgd.original": torch.tensor([0.54]),
        "nerf.radiance_field.mlp_base.0.params": torch.tensor(
            np.asarray(want_rf["hash"]["table"]).reshape(-1)
        ),
        "nerf.occupancy_grid.occs": torch.rand(64),
        "nerf.occupancy_grid._binary": torch.rand(4, 4, 4) > 0.5,
    }
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp_base.1",
                       want_rf["mlp_base"])
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp_head",
                       want_rf["mlp_head"])

    flat = convert_state_dict(sd, n_features_per_level=2)

    # restore through the standard component loader
    params_like = {
        "contrast_threshold": {
            "raw_p2n_ratio": jax.numpy.zeros((1,))
        },
        "refractory_period": {"raw_tau": jax.numpy.zeros((1,))},
        "nerf": {
            "radiance_field": fields.init_field(
                jax.random.PRNGKey(1), spec
            ),
            "render_bkgd_raw": jax.numpy.zeros((1,)),
        },
    }
    params = params_like
    for component in ckpt_mod.MODEL_COMPONENTS:
        params = ckpt_mod.restore_component(flat, params, component)

    got = pytree.tree_to_flat_dict(params["nerf"]["radiance_field"])
    want = pytree.tree_to_flat_dict(want_rf)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
    np.testing.assert_allclose(
        np.asarray(params["contrast_threshold"]["raw_p2n_ratio"]), [0.3]
    )
    np.testing.assert_allclose(
        np.asarray(params["refractory_period"]["raw_tau"]), [-2.5]
    )
    np.testing.assert_allclose(
        np.asarray(params["nerf"]["render_bkgd_raw"]), [0.54]
    )

    # occupancy buffers come along (x-major flat layout on both sides)
    spec_occ = occupancy.build_spec(
        {"resolution": 4, "occ_thre": 1e-2, "ema_decay": 0.95,
         "warmup_steps": 1, "n": 1}, "aabb",
    )
    occ = ckpt_mod.restore_occ_state(flat, occupancy.init_state(spec_occ))
    np.testing.assert_allclose(
        np.asarray(occ["occs"]),
        sd["nerf.occupancy_grid.occs"].numpy(), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(occ["binary"]),
        sd["nerf.occupancy_grid._binary"].numpy().reshape(-1),
    )


def test_vanilla_checkpoint_round_trip():
    cfg = {
        "net_depth": 2, "net_width": 16, "skip_layer": 4,
        "net_depth_condition": 1, "net_width_condition": 8,
        "hidden_activation": "softplus",
        "density_activation": "shifted_trunc_exp",
        "radiance_activation": "softplus",
        "pos_encoder_max_deg": 4, "view_encoder_max_deg": 2,
        "weight_norm": False,
    }
    spec = fields.build_field_spec("mlp", cfg, "aabb", 1, 3)
    want_rf = fields.init_field(jax.random.PRNGKey(0), spec)

    sd = {}
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp.base",
                       want_rf["trunk"])
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp.sigma_layer",
                       want_rf["sigma_layer"])
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp.bottleneck_layer",
                       want_rf["bottleneck"])
    _torch_mlp_entries(sd, "nerf.radiance_field.mlp.rgb_layer",
                       want_rf["rgb_layer"])

    flat = convert_state_dict(sd)
    params = {"nerf": {"radiance_field": fields.init_field(
        jax.random.PRNGKey(1), spec
    )}}
    params = ckpt_mod.restore_component(flat, params, "nerf")
    got = pytree.tree_to_flat_dict(params["nerf"]["radiance_field"])
    want = pytree.tree_to_flat_dict(want_rf)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
