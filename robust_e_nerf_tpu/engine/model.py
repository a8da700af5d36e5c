"""Model assembly: config + dataset -> specs, buffers, parameters.

Counterpart of `RobustENeRF.__init__` (robust_e_nerf.py:25-292) including its
data-dependent construction (SURVEY.md section 3.5):

  * camera calibration -> Bayer flag, train intrinsics;
  * val/test posed-image sets -> eval intrinsics, image sizes, pixel-value
    normalization bounds;
  * `aabb: auto` from the pose extremes (robust_e_nerf.py:206-212);
  * `render_step_size: auto` (:220-228);
  * refractory-period max-tau scan over the raw event stream (cached);
  * alpha_over_white_bg -> learnable softplus background (:154-159).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import camera_poses as poses_mod
from ..data import events as events_mod
from ..data import posed_images as posed_mod
from ..loss_metric import loss as loss_mod
from ..models import event_model, nerf as nerf_mod, trajectory as traj_mod
from ..utils import tensor_ops

NUM_DIM = 3
DEFAULT_TRAIN_RAY_BATCH_CAPACITY = 32768
DEFAULT_EVAL_SAMPLE_CAPACITY = 4 * 2**20


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    nerf: nerf_mod.NerfSpec
    loss: loss_mod.LossSpec
    min_modeled_intensity: float
    has_bayer: bool
    batch_capacity: int  # fixed ray rows per per-chip training batch


@dataclasses.dataclass
class EvalStage:
    """Per-stage evaluation assets (host)."""

    intrinsics_inv: np.ndarray        # (3, 3)
    img_pixel_pos: np.ndarray         # (H, W, 2)
    min_normalized_pixel_value: float
    max_normalized_pixel_value: float
    sample_id: list                   # [str]
    img: np.ndarray                   # (N, [3,] H, W)
    T_wc_position: np.ndarray         # (N, 3)
    T_wc_orientation: np.ndarray      # (N, 3, 3)


@dataclasses.dataclass
class Model:
    spec: ModelSpec
    buffers: dict                     # device-constant pytree
    params: dict                      # trainable pytree
    t0_ns: int                        # timestamp re-basing origin
    events: dict                      # transformed events (host, int64 ns)
    val_stage: EvalStage
    test_stage: Optional[EvalStage]
    max_refractory_period_s: float


def _build_eval_stage(dataset_directory, stage, permutation_seed,
                      alpha_over_white_bg, dataset_ratio=1.0,
                      eff_batch_size=1) -> EvalStage:
    """Load one eval stage's posed images.

    `dataset_ratio`/`eff_batch_size` implement the reference's eval-set
    trimming (`val/test_dataset_ratio`, datamodule.py:119-137): an int
    ratio keeps `ratio * eff_batch_size` images, a float keeps that
    fraction — always the first N of the (already permuted) set, matching
    TrimDataset(start_index=0).  `*_eff_batch_size` has no other effect
    here: evaluation renders per image in test_chunk_size-ray chunks, so
    the reference's per-device eval batch division (datamodule.py:62-78)
    has no fixed-shape counterpart.
    """
    imgs = posed_mod.load_posed_images(
        dataset_directory, stage, permutation_seed=permutation_seed,
        alpha_over_white_bg=alpha_over_white_bg,
    )
    from ..data import pipeline as pipeline_mod

    subset = pipeline_mod.trim_length(
        len(imgs["img"]), dataset_ratio, int(eff_batch_size)
    )
    for key in ("sample_id", "img", "T_wc_position", "T_wc_orientation"):
        imgs[key] = imgs[key][:subset]
    height, width = imgs["img"].shape[-2:]
    return EvalStage(
        intrinsics_inv=np.linalg.inv(
            imgs["intrinsics"].astype(np.float64)
        ).astype(np.float32),
        img_pixel_pos=tensor_ops.pixel_meshgrid(height, width),
        min_normalized_pixel_value=imgs["min_normalized_pixel_value"],
        max_normalized_pixel_value=imgs["max_normalized_pixel_value"],
        sample_id=imgs["sample_id"],
        img=imgs["img"],
        T_wc_position=imgs["T_wc_position"],
        T_wc_orientation=imgs["T_wc_orientation"],
    )


def build_model(config, seed, num_chips) -> Model:
    """Assemble specs/buffers/params from a run config (run.py:45-63)."""
    data_cfg = config["data"]
    model_cfg = config["model"]
    dataset_directory = data_cfg["dataset_directory"]
    alpha_over_white_bg = bool(data_cfg["alpha_over_white_bg"])
    eval_target = set(config["eval_target"])

    calibration = events_mod.load_camera_calibration(dataset_directory)
    has_bayer = events_mod.has_bayer_filter(calibration)
    radiance_dim = 3 if has_bayer else 1
    train_intrinsics_inv = np.linalg.inv(
        np.asarray(calibration["intrinsics"], dtype=np.float64)
    ).astype(np.float32)

    # evaluation stages (robust_e_nerf.py:86-152 + datamodule.py:106-115)
    if eval_target == {"event_view"}:
        val_img_stage = test_img_stage = "train"
    elif eval_target == {"novel_view"}:
        val_img_stage, test_img_stage = "val", "test"
    else:
        raise NotImplementedError(sorted(eval_target))
    eval_perm_seed = data_cfg.get("eval_dataset_perm_seed")
    val_stage = _build_eval_stage(
        dataset_directory, val_img_stage, eval_perm_seed,
        alpha_over_white_bg,
        dataset_ratio=data_cfg.get("val_dataset_ratio", 1.0),
        eff_batch_size=data_cfg.get("val_eff_batch_size", 1),
    )
    try:
        if eval_target == {"event_view"}:
            test_stage = val_stage
        else:
            test_stage = _build_eval_stage(
                dataset_directory, test_img_stage, eval_perm_seed,
                alpha_over_white_bg,
                dataset_ratio=data_cfg.get("test_dataset_ratio", 1.0),
                eff_batch_size=data_cfg.get("test_eff_batch_size", 1),
            )
    except FileNotFoundError:
        test_stage = None

    # event-generation params (event_generation_params.py)
    ct_params, ct_buffers = event_model.build_contrast_threshold(
        float(calibration["pos_contrast_threshold"]),
        float(calibration["neg_contrast_threshold"]),
    )
    max_tau_ns = events_mod.load_or_build_max_refractory_period(
        dataset_directory
    )
    max_tau_s = float(max_tau_ns) / poses_mod.NANOSECONDS_PER_SECOND
    calibrated_tau_s = (
        float(calibration["refractory_period"])
        / poses_mod.NANOSECONDS_PER_SECOND
    )
    rp_params, rp_buffers = event_model.build_refractory_period(
        calibrated_tau_s, max_tau_s
    )

    # trajectory (trajectories.py) with time re-basing
    camera_poses = poses_mod.load_camera_poses(dataset_directory)
    positions, quats, pose_ts_s, t0_ns = poses_mod.prepare_trajectory_arrays(
        camera_poses
    )
    trajectory_buffers = traj_mod.build_trajectory_buffers(
        positions, quats, pose_ts_s
    )

    # NeRF spec: auto aabb from pose extremes (robust_e_nerf.py:206-212)
    nerf_cfg = model_cfg["nerf"]
    if nerf_cfg["aabb"] == "auto":
        aabb = np.concatenate(
            [positions.min(axis=0), positions.max(axis=0)]
        ).astype(np.float32)
    else:
        aabb = np.asarray(nerf_cfg["aabb"], dtype=np.float32)

    render_bkgd = "parameter" if alpha_over_white_bg else None
    sample_budget = (
        int(data_cfg["train_eff_ray_sample_batch_size"]) // num_chips
    )
    train_capacity = int(1.25 * sample_budget)
    eval_capacity = int(
        nerf_cfg.get("eval_sample_capacity", DEFAULT_EVAL_SAMPLE_CAPACITY)
    )
    nerf_spec = nerf_mod.build_nerf_spec(
        nerf_cfg, aabb, radiance_dim, render_bkgd, train_capacity,
        eval_capacity,
    )

    loss_spec = loss_mod.build_loss_spec(config["loss"])
    batch_capacity = int(
        data_cfg.get(
            "train_ray_batch_capacity", DEFAULT_TRAIN_RAY_BATCH_CAPACITY
        )
    ) // num_chips
    spec = ModelSpec(
        nerf=nerf_spec,
        loss=loss_spec,
        min_modeled_intensity=float(model_cfg["min_modeled_intensity"]),
        has_bayer=has_bayer,
        batch_capacity=batch_capacity,
    )

    key = jax.random.PRNGKey(seed)
    params = {
        "contrast_threshold": ct_params,
        "refractory_period": rp_params,
        "nerf": nerf_mod.init_nerf_params(key, nerf_spec),
    }
    buffers = {
        "aabb": jnp.asarray(aabb),
        "train_intrinsics_inv": jnp.asarray(train_intrinsics_inv),
        "trajectory": trajectory_buffers,
        "contrast_threshold": ct_buffers,
        "refractory_period": rp_buffers,
    }

    events = events_mod.load_or_build_transformed_events(dataset_directory)
    events = events_mod.permute_events(
        events, data_cfg.get("train_dataset_perm_seed")
    )

    return Model(
        spec=spec,
        buffers=buffers,
        params=params,
        t0_ns=t0_ns,
        events=events,
        val_stage=val_stage,
        test_stage=test_stage,
        max_refractory_period_s=max_tau_s,
    )
