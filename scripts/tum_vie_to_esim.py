#!/usr/bin/env python
"""Convert a TUM-VIE sequence to the preprocessed ESIM dataset layout.

From-scratch counterpart of the reference `scripts/tum_vie_to_esim.py`
(behavior spec in SURVEY.md section 2.1 #3 / 3.4); same CLI, same outputs:

  * event-camera intrinsics/distortion from the calibration JSON (kb4 ->
    "equidistant") with the paper's assumed event-camera parameters
    (C_n = 0.25, C_p/C_n = 1.458, tau = 1375 ns);
  * mocap marker poses -> event-camera poses via the calibration chain
    T_wc = T_wm @ inv(T_imu_marker) @ T_imu_event, trimmed to
    [start_timestamp, end_timestamp) and re-referenced to the first kept
    pose time;
  * h5 events (microseconds -> nanoseconds, time-shifted and span-filtered);
  * RGB validation views: event-camera poses interpolated at the image
    timestamps with the production `interpolate_pose` (the same continuous
    trajectory the trainer uses), composed with T_event_rgb, written in
    OpenGL convention to views/transforms_val.json next to
    fisheye-undistorted JPEGs (first 80 frames dropped).

Host-only; uses this package's JAX trajectory instead of torch.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(1, os.path.join(sys.path[0], ".."))

US_TO_NS = 1000
T_CCOMMON_COPENGL = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

SEQUENCES_WITH_CONFIG_A = (
    "loop-floor0", "loop-floor1", "loop-floor2", "loop-floor3",
    "mocap-desk", "mocap-desk2", "skate-easy",
)
CAMERA_INDICES = {
    "rgb": {"left": 0, "right": 1},
    "event": {"left": 2, "right": 3},
}
TRIM_INITIAL_NUM_IMAGES = 80

# assumed / estimated event-camera parameters (tum_vie_to_esim.py:62-64)
ESTIMATED_REFRACTORY_PERIOD_NS = 1375
ASSUMED_NEG_CONTRAST_THRESHOLD = 0.25
ESTIMATED_P2N_CONTRAST_THRESHOLD_RATIO = 1.458


def se3_from_parts(position, quat_xyzw):
    from scipy.spatial.transform import Rotation

    position = np.asarray(position, np.float32)
    mat = np.zeros(position.shape[:-1] + (4, 4), dtype=np.float32)
    mat[..., :3, 3] = position
    mat[..., :3, :3] = Rotation.from_quat(
        np.asarray(quat_xyzw, np.float32)
    ).as_matrix()
    mat[..., 3, 3] = 1
    return mat


def se3_from_json(node):
    return se3_from_parts(
        [node["px"], node["py"], node["pz"]],
        [node["qx"], node["qy"], node["qz"], node["qw"]],
    )


def se3_to_parts(mat):
    from scipy.spatial.transform import Rotation

    position = mat[..., :3, 3]
    quat = Rotation.from_matrix(mat[..., :3, :3]).as_quat().astype(
        np.float32
    )
    return position.astype(np.float32), quat


def intrinsics_matrix(node):
    return np.array(
        [[node["fx"], 0, node["cx"]],
         [0, node["fy"], node["cy"]],
         [0, 0, 1]],
        dtype=np.float32,
    )


def distortion_vector(node):
    return np.array(
        [node["k1"], node["k2"], node["k3"], node["k4"]], dtype=np.float32
    )


def main(args):
    import cv2
    import h5py
    try:
        import hdf5plugin  # noqa: F401 - registers the blosc filters
    except ImportError:
        pass

    config_id = (
        "A" if args.sequence_name in SEQUENCES_WITH_CONFIG_A else "B"
    )
    vi_gt_path = os.path.join(
        args.raw_dataset_path, f"{args.sequence_name}-vi_gt_data"
    )
    rgb_idx = CAMERA_INDICES["rgb"][args.camera_position]
    event_idx = CAMERA_INDICES["event"][args.camera_position]
    out = args.preprocessed_dataset_path
    os.makedirs(out, exist_ok=True)

    with open(os.path.join(
        args.raw_dataset_path, f"camera-calibration{config_id}.json"
    )) as f:
        camera_calibration = json.load(f)["value0"]
    with open(os.path.join(
        args.raw_dataset_path, f"mocap-imu-calibration{config_id}.json"
    )) as f:
        mocap_imu_calibration = json.load(f)["value0"]

    # ---- event-camera calibration npz ----
    event_calib = camera_calibration["intrinsics"][event_idx]
    assert event_calib["camera_type"] == "kb4"
    event_intrinsics = intrinsics_matrix(event_calib["intrinsics"])
    event_distortion = distortion_vector(event_calib["intrinsics"])
    img_width, img_height = camera_calibration["resolution"][event_idx]
    neg_ct = np.array(ASSUMED_NEG_CONTRAST_THRESHOLD, np.float32)
    np.savez(
        os.path.join(out, "camera_calibration.npz"),
        intrinsics=event_intrinsics,
        distortion_params=event_distortion,
        distortion_model=np.array("equidistant"),
        img_height=np.array(img_height, np.uint16),
        img_width=np.array(img_width, np.uint16),
        pos_contrast_threshold=(
            ESTIMATED_P2N_CONTRAST_THRESHOLD_RATIO * neg_ct
        ),
        neg_contrast_threshold=neg_ct,
        refractory_period=np.array(ESTIMATED_REFRACTORY_PERIOD_NS,
                                   np.float32),
        bayer_pattern="",
    )

    # ---- mocap marker poses -> event-camera poses ----
    marker_poses = np.loadtxt(os.path.join(vi_gt_path, "mocap_data.txt"))
    t_wm_timestamp = (US_TO_NS * marker_poses[:, 0]).astype(np.int64)
    t_wm = se3_from_parts(marker_poses[:, 1:4], marker_poses[:, 4:8])

    keep = (
        (args.start_timestamp <= t_wm_timestamp)
        & (t_wm_timestamp < args.end_timestamp)
    )
    t_wm_timestamp = t_wm_timestamp[keep]
    t0_ns = int(t_wm_timestamp[0])
    t_wc_timestamp = t_wm_timestamp - t0_ns
    t_wm = t_wm[keep]

    t_imu_marker = se3_from_json(mocap_imu_calibration["T_imu_marker"])
    t_imu_event = se3_from_json(
        camera_calibration["T_imu_cam"][event_idx]
    )
    t_marker_event = np.linalg.inv(t_imu_marker) @ t_imu_event
    t_wc = t_wm @ t_marker_event
    t_wc_position, t_wc_orientation = se3_to_parts(t_wc)
    np.savez(
        os.path.join(out, "camera_poses.npz"),
        T_wc_position=t_wc_position,
        T_wc_orientation=t_wc_orientation,
        T_wc_timestamp=t_wc_timestamp,
    )

    # ---- events ----
    events_path = os.path.join(
        args.raw_dataset_path,
        f"{args.sequence_name}-events_{args.camera_position}.h5",
    )
    with h5py.File(events_path, "r") as f:
        event_position = np.stack(
            (f["events"]["x"], f["events"]["y"]), axis=1
        )
        event_timestamp = (
            US_TO_NS * np.asarray(f["events"]["t"]) - t0_ns
        )
        event_polarity = np.asarray(f["events"]["p"], dtype=bool)
    keep = (
        (t_wc_timestamp[0] <= event_timestamp)
        & (event_timestamp <= t_wc_timestamp[-1])
    )
    np.savez(
        os.path.join(out, "raw_events.npz"),
        position=np.ascontiguousarray(event_position[keep]),
        timestamp=np.ascontiguousarray(event_timestamp[keep]),
        polarity=np.ascontiguousarray(event_polarity[keep]),
    )

    # ---- RGB validation views ----
    rgb_calib = camera_calibration["intrinsics"][rgb_idx]
    assert rgb_calib["camera_type"] == "kb4"
    rgb_intrinsics = intrinsics_matrix(rgb_calib["intrinsics"])
    rgb_distortion = distortion_vector(rgb_calib["intrinsics"])
    rgb_width, rgb_height = camera_calibration["resolution"][rgb_idx]
    new_rgb_intrinsics = (
        cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            rgb_intrinsics, rgb_distortion, (rgb_width, rgb_height),
            R=np.eye(3, dtype=np.float32), balance=0,
        )
    )

    distorted_images_path = os.path.join(
        vi_gt_path, f"{args.camera_position}_images"
    )
    image_timestamp = np.loadtxt(os.path.join(
        distorted_images_path,
        f"image_timestamps_{args.camera_position}.txt",
    ))
    image_timestamp = (
        US_TO_NS * image_timestamp
    ).astype(np.int64) - t0_ns
    valid_image = (
        (0 <= image_timestamp) & (image_timestamp <= t_wc_timestamp[-1])
    )
    valid_image[:TRIM_INITIAL_NUM_IMAGES] = False
    kept_image_timestamp = image_timestamp[valid_image]

    # interpolate event-camera poses at image times with the production
    # trajectory (re-based f32 seconds, as in training)
    import jax.numpy as jnp

    from robust_e_nerf_tpu.models import trajectory as traj_mod

    traj = traj_mod.build_trajectory_buffers(
        t_wc_position, t_wc_orientation,
        t_wc_timestamp.astype(np.float64) / 1e9,
    )
    interp_pos, interp_rot = traj_mod.interpolate_pose(
        traj,
        jnp.asarray(kept_image_timestamp.astype(np.float64) / 1e9,
                    jnp.float32),
    )
    t_w_event = np.zeros((len(kept_image_timestamp), 4, 4), np.float32)
    t_w_event[:, :3, 3] = np.asarray(interp_pos)
    t_w_event[:, :3, :3] = np.asarray(interp_rot)
    t_w_event[:, 3, 3] = 1

    t_imu_rgb = se3_from_json(camera_calibration["T_imu_cam"][rgb_idx])
    t_event_rgb = np.linalg.inv(t_imu_event) @ t_imu_rgb
    t_w_rgb = t_w_event @ t_event_rgb @ T_CCOMMON_COPENGL

    views_path = os.path.join(out, "views")
    stage_path = os.path.join(views_path, "val")
    os.makedirs(stage_path, exist_ok=True)
    image_indices = np.nonzero(valid_image)[0]
    frames = []
    for idx, matrix in zip(image_indices, t_w_rgb):
        filename = f"{idx:05d}.jpg"
        frames.append({
            "file_path": os.path.join(".", "val",
                                      os.path.splitext(filename)[0]),
            "transform_matrix": matrix.tolist(),
        })
        distorted = cv2.imread(
            os.path.join(distorted_images_path, filename),
            cv2.IMREAD_UNCHANGED,
        )
        undistorted = cv2.fisheye.undistortImage(
            distorted, rgb_intrinsics, rgb_distortion,
            Knew=new_rgb_intrinsics,
        )
        cv2.imwrite(os.path.join(stage_path, filename), undistorted)
    with open(os.path.join(views_path, "transforms_val.json"), "w") as f:
        json.dump(
            {"intrinsics": new_rgb_intrinsics.tolist(), "frames": frames},
            f, indent=4,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Convert TUM-VIE datasets to the pre-processed ESIM "
                    "format."
    )
    parser.add_argument("sequence_name", type=str,
                        help="TUM-VIE sequence to convert.")
    parser.add_argument("raw_dataset_path", type=str,
                        help="Path to the raw TUM-VIE datasets folder.")
    parser.add_argument("preprocessed_dataset_path", type=str,
                        help="Output path for the pre-processed dataset.")
    parser.add_argument("--camera_position", type=str,
                        choices=("left", "right"), default="left")
    parser.add_argument("--start_timestamp", type=int, default=0)
    parser.add_argument("--end_timestamp", type=float,
                        default=float("inf"))
    main(parser.parse_args())
