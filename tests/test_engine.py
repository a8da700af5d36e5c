"""End-to-end engine tests on a tiny synthetic dataset.

Expensive jit compiles are shared through module-scoped fixtures; the
multi-chip test runs the same step on the virtual 8-device CPU mesh
(SURVEY.md section 4's answer to multi-node testing).
"""

import os

import jax
import numpy as np
import pytest

from robust_e_nerf_tpu.data import synthetic
from robust_e_nerf_tpu.engine import checkpoint as ckpt_mod
from robust_e_nerf_tpu.engine.trainer import Trainer
from robust_e_nerf_tpu.parallel import mesh as mesh_mod
from robust_e_nerf_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("engine_ds"))
    synthetic.generate_dataset(
        out, img_width=24, img_height=24, duration_s=2.0,
        num_pose_samples=41, num_sim_frames=81, num_train_views=2,
        num_val_views=2, num_test_views=2,
    )
    return out


def tiny_config(dataset, tmp_path, **overrides):
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "train",
                     "tpu-sphere.yaml")
    )
    cfg.data.dataset_directory = dataset
    cfg.data.train_eff_ray_sample_batch_size = 16384
    cfg.data.train_init_eff_batch_size = 512
    cfg.data.train_ray_batch_capacity = 2048
    cfg.model.nerf.occ_grid.resolution = 32
    cfg.model.nerf.occ_grid.warmup_steps = 8
    cfg.model.nerf.eval_sample_capacity = 1 << 17
    cfg.model.nerf.test_chunk_size = 576
    cfg.model.nerf.ngp.pos_encoding.n_levels = 4
    cfg.model.nerf.ngp.pos_encoding.log2_hashmap_size = 12
    cfg.trainer.max_epochs = 1
    cfg.trainer.limit_train_batches = 25
    cfg.trainer.log_every_n_steps = 10
    cfg.logger.save_dir = str(tmp_path / "logs")
    for key, value in overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return cfg


@pytest.fixture(scope="module")
def trained(dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine_run")
    cfg = tiny_config(dataset, tmp)
    trainer = Trainer(cfg)
    losses = []
    orig_step = trainer.train_step

    def recording_step(*args, **kwargs):
        out = orig_step(*args, **kwargs)
        losses.append(float(out[3]))
        return out

    trainer.train_step = recording_step
    trainer.fit()
    trainer.losses = losses
    return trainer


def test_loss_decreases(trained):
    losses = trained.losses
    assert len(losses) == 25
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_dynamic_batch_size_controller(trained):
    # the controller retargets batch size = budget / mean samples per ray
    ctrl = jax.device_get(trained.ctrl)
    assert int(ctrl["step"]) == trained.global_step
    assert int(ctrl["batch_size"]) != 512
    assert 1 <= int(ctrl["batch_size"]) <= trained.global_batch_capacity


def test_eval_metrics_finite(trained):
    metrics = trained.run_evaluation("val")
    assert set(metrics) == {"val/l1", "val/psnr", "val/ssim", "val/lpips"}
    assert np.isfinite(metrics["val/l1"])
    assert np.isfinite(metrics["val/psnr"])
    assert -1 <= metrics["val/ssim"] <= 1


def test_checkpoint_roundtrip(trained, tmp_path):
    path = trained.save_checkpoint()
    assert os.path.isfile(path)
    flat = ckpt_mod.load_checkpoint_flat(path)
    params_before = jax.device_get(trained.params)
    restored = ckpt_mod.restore_params(flat, params_before)
    for (k1, a), (k2, b) in zip(
        sorted_flat(params_before), sorted_flat(restored)
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(flat["step"]) == trained.global_step


def sorted_flat(tree):
    from robust_e_nerf_tpu.utils import pytree

    return sorted(pytree.tree_to_flat_dict(tree).items())


def test_component_load_and_freeze(trained, dataset, tmp_path_factory):
    """Test-stage pattern (configs/test/synthetic.yaml:28-58): load all
    components from the train checkpoint and freeze ct/tau."""
    ckpt = trained.save_checkpoint()
    tmp = tmp_path_factory.mktemp("engine_load")
    cfg = tiny_config(
        dataset, tmp,
        **{
            "model.checkpoint_filepath": ckpt,
            "model.contrast_threshold.load_state_dict": True,
            "model.refractory_period.load_state_dict": True,
            "model.nerf.load_state_dict": True,
        },
    )
    t2 = Trainer(cfg)
    p_trained = jax.device_get(trained.params)
    p_loaded = jax.device_get(t2.params)
    np.testing.assert_array_equal(
        np.asarray(p_loaded["nerf"]["radiance_field"]["hash"]["table"]),
        np.asarray(p_trained["nerf"]["radiance_field"]["hash"]["table"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p_loaded["refractory_period"]["raw_tau"]),
        np.asarray(p_trained["refractory_period"]["raw_tau"]),
    )


def test_frozen_components_stay_fixed(trained):
    """ct/tau are frozen in this config -> their raw params never move."""
    params = jax.device_get(trained.params)
    from robust_e_nerf_tpu.utils import transforms

    # ct was initialized from calibration ratio = 1.0
    np.testing.assert_allclose(
        float(transforms.softplus(
            params["contrast_threshold"]["raw_p2n_ratio"]
        )),
        1.0, rtol=1e-5,
    )


def test_multichip_mesh(dataset, tmp_path_factory):
    """Same training step on all 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    tmp = tmp_path_factory.mktemp("engine_mc")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.gpus": [0, 1, 2, 3, 4, 5, 6, 7],
           "trainer.limit_train_batches": 3},
    )
    trainer = Trainer(cfg)
    assert trainer.num_chips == 8
    trainer.fit()
    assert trainer.global_step == 3


def test_balanced_valid_mask():
    mask = mesh_mod.balanced_valid_mask(16, 5, 4)
    # shards of 4 rows: counts 2,1,1,1
    blocks = mask.reshape(4, 4)
    np.testing.assert_array_equal(blocks.sum(axis=1), [2, 1, 1, 1])
    assert blocks[0, :2].all() and not blocks[0, 2:].any()


def test_resume_from_checkpoint(trained, dataset, tmp_path_factory):
    """Full training-state resume (trainer.resume_from_checkpoint)."""
    ckpt = trained.save_checkpoint()
    tmp = tmp_path_factory.mktemp("engine_resume")
    cfg = tiny_config(
        dataset, tmp, **{"trainer.resume_from_checkpoint": ckpt}
    )
    t2 = Trainer(cfg)
    assert t2.global_step == trained.global_step
    ctrl = jax.device_get(t2.ctrl)
    assert int(ctrl["step"]) == trained.global_step
    p1 = jax.device_get(trained.params)
    p2 = jax.device_get(t2.params)
    np.testing.assert_array_equal(
        np.asarray(p1["nerf"]["radiance_field"]["hash"]["table"]),
        np.asarray(p2["nerf"]["radiance_field"]["hash"]["table"]),
    )
    # occupancy state restored too
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(trained.occ_state["binary"])),
        np.asarray(jax.device_get(t2.occ_state["binary"])),
    )
