#!/usr/bin/env python
"""Preprocess an ESIM .conf file + ESIM-generated rosbag into a dataset.

From-scratch counterpart of the reference `scripts/preprocess_esim.py`
(behavior spec in SURVEY.md section 2.1 #2 / 3.3); same CLI and the same
on-disk outputs:

  raw_events.npz            {position u16, timestamp i64 ns, polarity bool}
  camera_poses.npz          {T_wc_position, T_wc_orientation XYZW,
                             T_wc_timestamp ns} (IMU-synced poses only)
  camera_calibration.npz    {intrinsics, distortion_params/model, img sizes,
                             pos/neg contrast thresholds, refractory period,
                             bayer pattern}
  renderer_params.npz       planar: derived source intrinsics + blur params;
                            blender: interm color space + log_eps

The ROS bag is read through the `rosbag` package when available (ROS
noetic), otherwise through the pure-python `rosbags` package if installed;
both are host-side only.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(1, os.path.join(sys.path[0], ".."))

INTERM_COLOR_SPACE_NAMES = {0: "display", 1: "linear"}
COLOR_BAYER_PATTERN = "RGGB"  # ESIM's color simulation layout
TOPICS = ("/cam0/events", "/cam0/pose", "/cam0/camera_info", "/imu")
GAUSSIAN_BLUR_KSIZE = np.array([21, 21])

# ESIM flag defaults relevant to dataset reconstruction
CONF_DEFAULTS = {
    "renderer_type": 0,
    "renderer_texture": "",
    "renderer_hfov_cam_source_deg": 130.0,
    "renderer_preprocess_median_blur": 0,
    "renderer_preprocess_gaussian_blur": 0.0,
    "renderer_plane_x": 0.0,
    "renderer_plane_y": 0.0,
    "renderer_plane_z": -1.0,
    "renderer_plane_qw": 0.0,
    "renderer_plane_qx": 1.0,
    "renderer_plane_qy": 0.0,
    "renderer_plane_qz": 0.0,
    "blender_interm_color_space": 0,
    "contrast_threshold_pos": 1.0,
    "contrast_threshold_neg": 1.0,
    "refractory_period_ns": 0,
    "log_eps": 0.001,
    "simulate_color_events": False,
}


def parse_conf(conf_path):
    """Parse an ESIM flagfile (`--flag=value` lines, `#` comments)."""
    values = dict(CONF_DEFAULTS)
    with open(conf_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or not line.startswith("--"):
                continue
            body = line[2:]
            if "=" in body:
                name, raw = body.split("=", 1)
            else:
                parts = body.split(None, 1)
                name = parts[0]
                raw = parts[1] if len(parts) > 1 else "true"
            name = name.strip()
            raw = raw.strip()
            if name not in values:
                continue  # flags irrelevant to dataset reconstruction
            default = CONF_DEFAULTS[name]
            if isinstance(default, bool):
                values[name] = raw.lower() in ("1", "true", "yes")
            elif isinstance(default, int):
                values[name] = int(float(raw))
            elif isinstance(default, float):
                values[name] = float(raw)
            else:
                values[name] = raw
    return values


def preprocess_conf(conf_path, dataset_path):
    """Write renderer_params.npz; return event-camera model calibration."""
    import cv2

    conf = parse_conf(conf_path)
    os.makedirs(dataset_path, exist_ok=True)
    renderer_params_path = os.path.join(dataset_path,
                                        "renderer_params.npz")

    if conf["renderer_type"] == 0:  # planar renderer
        planar_img = cv2.imread(conf["renderer_texture"])
        height, width = planar_img.shape[:2]
        focal = (width / 2) / np.tan(
            np.deg2rad(conf["renderer_hfov_cam_source_deg"] / 2)
        )
        planar_intrinsics = np.array(
            [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
            dtype=np.float32,
        )
        np.savez(
            renderer_params_path,
            planar_img_filename=os.path.basename(conf["renderer_texture"]),
            planar_intrinsics=planar_intrinsics,
            median_blur_ksize=np.array(
                conf["renderer_preprocess_median_blur"]
            ),
            gaussian_blur_ksize=GAUSSIAN_BLUR_KSIZE,
            gaussian_blur_sigma=np.array(
                conf["renderer_preprocess_gaussian_blur"]
            ),
            T_wp_position=np.array(
                [conf["renderer_plane_x"], conf["renderer_plane_y"],
                 conf["renderer_plane_z"]],
                dtype=np.float32,
            ),
            T_wp_orientation=np.array(
                [conf["renderer_plane_qx"], conf["renderer_plane_qy"],
                 conf["renderer_plane_qz"], conf["renderer_plane_qw"]],
                dtype=np.float32,
            ),
        )
    elif conf["renderer_type"] == 4:  # blender renderer
        np.savez(
            renderer_params_path,
            interm_color_space=INTERM_COLOR_SPACE_NAMES[
                conf["blender_interm_color_space"]
            ],
            log_eps=conf["log_eps"],
        )
    else:
        raise NotImplementedError(
            f"renderer_type {conf['renderer_type']}"
        )

    bayer = COLOR_BAYER_PATTERN if conf["simulate_color_events"] else ""
    return (
        np.array(conf["contrast_threshold_pos"], dtype=np.float32),
        np.array(conf["contrast_threshold_neg"], dtype=np.float32),
        np.array(conf["refractory_period_ns"]),
        bayer,
    )


def iter_bag_messages(rosbag_path, topics):
    """Yield (topic, msg) over the bag; prefers the ROS `rosbag` package,
    falls back to the pure-python `rosbags` package."""
    try:
        import rosbag

        bag = rosbag.Bag(rosbag_path)
        for topic, msg, _t in bag.read_messages(topics=topics):
            yield topic, msg
        return
    except ImportError:
        pass
    try:
        from rosbags.highlevel import AnyReader
        from pathlib import Path

        with AnyReader([Path(rosbag_path)]) as reader:
            conns = [c for c in reader.connections if c.topic in topics]
            for conn, _ts, raw in reader.messages(connections=conns):
                yield conn.topic, reader.deserialize(raw, conn.msgtype)
        return
    except ImportError:
        raise ImportError(
            "reading ROS bags requires either the ROS `rosbag` package or "
            "the pure-python `rosbags` package"
        )


def _stamp_to_nsec(stamp):
    if hasattr(stamp, "to_nsec"):
        return stamp.to_nsec()
    # rosbags-style Time with sec/nanosec
    return int(stamp.sec) * 1_000_000_000 + int(stamp.nanosec)


def preprocess_rosbag(rosbag_path, dataset_path, pos_contrast_threshold,
                      neg_contrast_threshold, refractory_period,
                      bayer_pattern):
    preprocess_messages(
        iter_bag_messages(rosbag_path, TOPICS), dataset_path,
        pos_contrast_threshold, neg_contrast_threshold, refractory_period,
        bayer_pattern,
    )


def preprocess_messages(messages, dataset_path, pos_contrast_threshold,
                        neg_contrast_threshold, refractory_period,
                        bayer_pattern):
    """Core preprocessing over an iterable of (topic, msg) pairs.

    Split from the bag reader so the full pipeline (IMU-synced pose
    filtering, event time-span filtering, npz outputs) is testable without
    a ROS installation; messages only need the rosbag/rosbags attribute
    surface used below.
    """
    event_position, event_timestamp, event_polarity = [], [], []
    pose_position, pose_orientation, pose_timestamp = [], [], []
    imu_timestamp = []
    img_height = img_width = None
    intrinsics = distortion_params = distortion_model = None

    for topic, msg in messages:
        if topic == TOPICS[0]:  # events
            for event in msg.events:
                event_position.append((event.x, event.y))
                event_timestamp.append(_stamp_to_nsec(event.ts))
                event_polarity.append(event.polarity)
            img_height = np.array(msg.height, dtype=np.uint16)
            img_width = np.array(msg.width, dtype=np.uint16)
        elif topic == TOPICS[1]:  # poses
            p, q = msg.pose.position, msg.pose.orientation
            pose_position.append((p.x, p.y, p.z))
            pose_orientation.append((q.x, q.y, q.z, q.w))
            pose_timestamp.append(_stamp_to_nsec(msg.header.stamp))
        elif topic == TOPICS[2]:  # camera info
            intrinsics = np.array(msg.K, dtype=np.float32).reshape(3, 3)
            intrinsics = np.ascontiguousarray(intrinsics)
            distortion_params = np.array(msg.D, dtype=np.float32)
            distortion_model = np.array(msg.distortion_model)
        elif topic == TOPICS[3]:  # imu
            imu_timestamp.append(_stamp_to_nsec(msg.header.stamp))

    event_position = np.array(event_position, dtype=np.uint16)
    event_timestamp = np.array(event_timestamp)
    event_polarity = np.array(event_polarity)
    pose_position = np.array(pose_position, dtype=np.float32)
    pose_orientation = np.array(pose_orientation, dtype=np.float32)
    pose_timestamp = np.array(pose_timestamp)
    imu_timestamp = np.array(imu_timestamp)

    # keep only IMU-synced poses (preprocess_esim.py:219-222 behavior: the
    # pose stream is downselected to timestamps present in the IMU stream)
    _, pose_keep, _ = np.intersect1d(
        pose_timestamp, imu_timestamp, assume_unique=True,
        return_indices=True,
    )
    pose_position = np.ascontiguousarray(pose_position[pose_keep])
    pose_orientation = np.ascontiguousarray(pose_orientation[pose_keep])
    pose_timestamp = imu_timestamp

    # keep only events inside the pose time span
    keep = (
        (pose_timestamp[0] <= event_timestamp)
        & (event_timestamp <= pose_timestamp[-1])
    )
    event_position = np.ascontiguousarray(event_position[keep])
    event_timestamp = np.ascontiguousarray(event_timestamp[keep])
    event_polarity = np.ascontiguousarray(event_polarity[keep])

    os.makedirs(dataset_path, exist_ok=True)
    np.savez(
        os.path.join(dataset_path, "raw_events.npz"),
        position=event_position,
        timestamp=event_timestamp,
        polarity=event_polarity,
    )
    np.savez(
        os.path.join(dataset_path, "camera_poses.npz"),
        T_wc_position=pose_position,
        T_wc_orientation=pose_orientation,
        T_wc_timestamp=pose_timestamp,
    )
    np.savez(
        os.path.join(dataset_path, "camera_calibration.npz"),
        intrinsics=intrinsics,
        distortion_params=distortion_params,
        distortion_model=distortion_model,
        img_height=img_height,
        img_width=img_width,
        pos_contrast_threshold=pos_contrast_threshold,
        neg_contrast_threshold=neg_contrast_threshold,
        refractory_period=refractory_period,
        bayer_pattern=bayer_pattern,
    )


def main(args):
    pos_ct, neg_ct, refractory_period, bayer = preprocess_conf(
        args.conf_path, args.dataset_path
    )
    preprocess_rosbag(
        args.rosbag_path, args.dataset_path, pos_ct, neg_ct,
        refractory_period, bayer,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Pre-process an ESIM .conf file & ESIM-generated "
                    "rosbag into a dataset"
    )
    parser.add_argument("conf_path", type=str,
                        help="Path to the ESIM conf file.")
    parser.add_argument("rosbag_path", type=str,
                        help="Path to the ESIM-generated rosbag.")
    parser.add_argument("dataset_path", type=str,
                        help="Desired path to the pre-processed dataset.")
    main(parser.parse_args())
