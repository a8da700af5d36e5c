"""End-to-end engine test in the TUM-VIE-style configuration:

  * sphere contraction + near/far planes + cone_angle > 0 (cone marching)
  * joint contrast-threshold + refractory-period optimization (unfrozen)
  * l_grad enabled -> the jvp path through trajectory -> rays -> render
  * event_view eval target (eval images = train views)

This is the configs/train/mocap-*.yaml shape of the system
(SURVEY.md section 2.3, configs/train/mocap-desk2.yaml).
"""

import os

import jax
import numpy as np
import pytest

from robust_e_nerf_tpu.data import synthetic
from robust_e_nerf_tpu.engine.trainer import Trainer
from robust_e_nerf_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tumvie_ds"))
    synthetic.generate_dataset(
        out, img_width=24, img_height=24, duration_s=2.0,
        num_pose_samples=41, num_sim_frames=81, num_train_views=2,
        num_val_views=2, num_test_views=2,
    )
    return out


def test_tumvie_style_training(dataset, tmp_path):
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "train",
                     "tpu-sphere.yaml")
    )
    cfg.data.dataset_directory = dataset
    cfg.data.train_eff_ray_sample_batch_size = 16384
    cfg.data.train_init_eff_batch_size = 256
    cfg.data.train_ray_batch_capacity = 1024
    cfg.data.alpha_over_white_bg = False  # mocap configs use no bkgd param
    cfg.eval_target = ["event_view"]
    # mocap-style nerf block (configs/train/mocap-desk2.yaml:37-54)
    cfg.model.nerf.contraction_type = "sphere"
    cfg.model.nerf.near_plane = 0.5
    cfg.model.nerf.far_plane = 8.0
    cfg.model.nerf.cone_angle = 0.004
    cfg.model.nerf.occ_grid.resolution = 32
    cfg.model.nerf.occ_grid.warmup_steps = 4
    cfg.model.nerf.eval_sample_capacity = 1 << 17
    cfg.model.nerf.test_chunk_size = 576
    cfg.model.nerf.ngp.pos_encoding.n_levels = 4
    cfg.model.nerf.ngp.pos_encoding.log2_hashmap_size = 12
    # joint event-camera-parameter optimization + l_grad
    cfg.model.contrast_threshold.freeze = False
    cfg.model.refractory_period.freeze = False
    cfg.loss.weight.log_intensity_grad = 1.0e-3
    cfg.loss.param_weight.log_intensity_grad = "mean_contrast_reciprocal"
    cfg.trainer.max_epochs = 1
    cfg.trainer.limit_train_batches = 12
    cfg.trainer.check_val_every_n_epoch = 10  # skip val inside fit
    cfg.logger.save_dir = str(tmp_path / "logs")

    trainer = Trainer(cfg)
    params_before = jax.device_get(trainer.params)
    losses = []
    orig_step = trainer.train_step

    def recording(*args, **kwargs):
        out = orig_step(*args, **kwargs)
        losses.append(float(out[3]))
        return out

    trainer.train_step = recording
    trainer.fit()

    assert np.isfinite(losses).all()
    params_after = jax.device_get(trainer.params)
    # the event-camera parameters actually moved (they are unfrozen and
    # the l_grad/l_diff losses feed them gradients)
    assert (
        float(params_after["contrast_threshold"]["raw_p2n_ratio"])
        != float(params_before["contrast_threshold"]["raw_p2n_ratio"])
    )
    assert (
        float(params_after["refractory_period"]["raw_tau"])
        != float(params_before["refractory_period"]["raw_tau"])
    )
    # tau stays inside its clamp
    from robust_e_nerf_tpu.models import event_model

    max_tau = float(
        jax.device_get(trainer.buffers)["refractory_period"]
        ["max_refractory_period"]
    )
    raw = float(params_after["refractory_period"]["raw_tau"])
    assert abs(raw) <= max_tau * event_model.MAX_SCALED_LOGIT_MAGNITUDE * (
        1 + 1e-5
    )

    # event-view evaluation works (eval images come from train views)
    metrics = trainer.run_evaluation("val")
    assert np.isfinite(metrics["val/psnr"])
