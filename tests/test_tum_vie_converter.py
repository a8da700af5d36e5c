"""TUM-VIE converter end-to-end test on a synthesized mini sequence
(VERDICT round-1 weak #7).

Synthesizes the full raw TUM-VIE surface the converter reads — calibration
JSONs, mocap txt, uncompressed h5 events, timestamped jpgs — runs the real
`main()`, and checks the outputs against the reference behavior
(/root/reference/scripts/tum_vie_to_esim.py:68-336): the calibration chain
T_wc = T_wm @ inv(T_imu_marker) @ T_imu_event, t0 re-referencing, event
span filtering, the 80-frame trim, OpenGL-convention view matrices, and
that the converted views load through the framework's PosedImage path.
"""

import importlib.util
import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

_SPEC = importlib.util.spec_from_file_location(
    "tum_vie_to_esim",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "tum_vie_to_esim.py"),
)
tv = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(tv)

US = 1000  # ns per us
SEQ = "mocap-desk2"  # config A sequence


def _cam_json(fx, fy, cx, cy, k=(0.02, -0.01, 0.001, -0.0005)):
    return {
        "camera_type": "kb4",
        "intrinsics": {
            "fx": fx, "fy": fy, "cx": cx, "cy": cy,
            "k1": k[0], "k2": k[1], "k3": k[2], "k4": k[3],
        },
    }


def _se3_json(px, py, pz, qx, qy, qz, qw):
    return {"px": px, "py": py, "pz": pz,
            "qx": qx, "qy": qy, "qz": qz, "qw": qw}


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    rng = np.random.default_rng(7)
    raw = str(tmp_path_factory.mktemp("tumvie_raw"))
    out = str(tmp_path_factory.mktemp("tumvie_out"))
    vi_gt = os.path.join(raw, f"{SEQ}-vi_gt_data")
    img_dir = os.path.join(vi_gt, "left_images")
    os.makedirs(img_dir)

    # ---- calibration JSONs (config A) ----
    rgb_w, rgb_h = 64, 48
    ev_w, ev_h = 32, 24
    camera_calibration = {"value0": {
        "intrinsics": [
            _cam_json(30.0, 30.0, rgb_w / 2, rgb_h / 2),   # rgb left
            _cam_json(30.0, 30.0, rgb_w / 2, rgb_h / 2),   # rgb right
            _cam_json(20.0, 20.0, ev_w / 2, ev_h / 2),     # event left
            _cam_json(20.0, 20.0, ev_w / 2, ev_h / 2),     # event right
        ],
        "resolution": [[rgb_w, rgb_h], [rgb_w, rgb_h],
                       [ev_w, ev_h], [ev_w, ev_h]],
        "T_imu_cam": [
            _se3_json(0.01, 0.02, 0.0, 0.0, 0.0, 0.0, 1.0),
            _se3_json(0.05, 0.02, 0.0, 0.0, 0.0, 0.0, 1.0),
            _se3_json(0.01, -0.02, 0.001, 0.0, 0.0, 0.1, 0.9949874),
            _se3_json(0.05, -0.02, 0.001, 0.0, 0.0, 0.1, 0.9949874),
        ],
    }}
    mocap_imu_calibration = {"value0": {
        "T_imu_marker": _se3_json(0.0, 0.0, 0.05, 0.0, 0.1, 0.0,
                                  0.9949874),
    }}
    with open(os.path.join(raw, "camera-calibrationA.json"), "w") as f:
        json.dump(camera_calibration, f)
    with open(os.path.join(raw, "mocap-imu-calibrationA.json"), "w") as f:
        json.dump(mocap_imu_calibration, f)

    # ---- mocap poses: 201 samples at 100 Hz starting at t = 50 s ----
    n_poses = 201
    t_us = (50_000_000 + 10_000 * np.arange(n_poses)).astype(np.int64)
    angles = np.linspace(0, np.pi / 4, n_poses)
    px = np.cos(angles)
    py = np.sin(angles)
    pz = np.full(n_poses, 0.3)
    quat = np.zeros((n_poses, 4))
    quat[:, 2] = np.sin(angles / 2)
    quat[:, 3] = np.cos(angles / 2)
    mocap = np.column_stack([t_us, px, py, pz, quat])
    np.savetxt(os.path.join(vi_gt, "mocap_data.txt"), mocap)

    # ---- events h5 (us timestamps, within + outside the pose span) ----
    n_events = 5000
    ev_t = np.sort(rng.integers(
        t_us[0] - 5000, t_us[-1] + 5000, n_events
    )).astype(np.int64)
    with h5py.File(os.path.join(raw, f"{SEQ}-events_left.h5"), "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=rng.integers(0, ev_w, n_events,
                                                dtype=np.uint16))
        g.create_dataset("y", data=rng.integers(0, ev_h, n_events,
                                                dtype=np.uint16))
        g.create_dataset("t", data=ev_t)
        g.create_dataset("p", data=(rng.random(n_events) > 0.5))

    # ---- 90 jpgs at 50 Hz: the first 80 are trimmed by design ----
    n_images = 90
    img_t_us = (t_us[0] + 20_000 * np.arange(n_images)).astype(np.int64)
    np.savetxt(os.path.join(img_dir, "image_timestamps_left.txt"),
               img_t_us)
    for i in range(n_images):
        img = (rng.random((rgb_h, rgb_w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:05d}.jpg"), img)

    args = SimpleNamespace(
        sequence_name=SEQ, raw_dataset_path=raw,
        preprocessed_dataset_path=out, camera_position="left",
        start_timestamp=0, end_timestamp=float("inf"),
    )
    tv.main(args)
    return SimpleNamespace(
        raw=raw, out=out, t_us=t_us, ev_t=ev_t, img_t_us=img_t_us,
        camera_calibration=camera_calibration,
        mocap_imu_calibration=mocap_imu_calibration, mocap=mocap,
    )


def test_event_calibration(converted):
    calib = np.load(os.path.join(converted.out,
                                 "camera_calibration.npz"))
    assert str(calib["distortion_model"]) == "equidistant"
    np.testing.assert_allclose(float(calib["neg_contrast_threshold"]),
                               0.25)
    np.testing.assert_allclose(
        float(calib["pos_contrast_threshold"]), 1.458 * 0.25, rtol=1e-6
    )
    assert float(calib["refractory_period"]) == 1375
    assert int(calib["img_width"]) == 32 and int(calib["img_height"]) == 24
    np.testing.assert_allclose(calib["intrinsics"][0, 0], 20.0)


def test_pose_chain_and_rebasing(converted):
    """T_wc = T_wm @ inv(T_imu_marker) @ T_imu_event, timestamps
    re-referenced to the first kept pose (reference :151-195)."""
    poses = np.load(os.path.join(converted.out, "camera_poses.npz"))
    ts = poses["T_wc_timestamp"]
    assert ts[0] == 0
    np.testing.assert_array_equal(
        ts, (converted.t_us - converted.t_us[0]) * US
    )
    # check the chain on the first sample
    t_wm = tv.se3_from_parts(converted.mocap[0, 1:4],
                             converted.mocap[0, 4:8])
    cc = converted.camera_calibration["value0"]
    t_imu_marker = tv.se3_from_json(
        converted.mocap_imu_calibration["value0"]["T_imu_marker"]
    )
    t_imu_event = tv.se3_from_json(cc["T_imu_cam"][2])
    expected = t_wm @ np.linalg.inv(t_imu_marker) @ t_imu_event
    np.testing.assert_allclose(poses["T_wc_position"][0],
                               expected[:3, 3], rtol=1e-5, atol=1e-6)


def test_event_conversion(converted):
    raw = np.load(os.path.join(converted.out, "raw_events.npz"))
    t0_ns = converted.t_us[0] * US
    span = (converted.t_us[-1] - converted.t_us[0]) * US
    assert np.all((0 <= raw["timestamp"]) & (raw["timestamp"] <= span))
    expected = np.sum(
        (converted.ev_t >= converted.t_us[0])
        & (converted.ev_t <= converted.t_us[-1])
    )
    assert len(raw["timestamp"]) == expected
    assert raw["polarity"].dtype == bool
    del t0_ns


def test_views_written_and_trimmed(converted):
    """First 80 frames dropped (reference :43,264); the rest get OpenGL
    transform matrices + undistorted jpgs."""
    with open(os.path.join(converted.out, "views",
                           "transforms_val.json")) as f:
        transforms = json.load(f)
    n_images = len(converted.img_t_us)
    pose_end = (converted.t_us[-1] - converted.t_us[0]) * US
    rebased = (converted.img_t_us - converted.t_us[0]) * US
    valid = (0 <= rebased) & (rebased <= pose_end)
    valid[:80] = False
    assert len(transforms["frames"]) == valid.sum() > 0
    for frame in transforms["frames"]:
        name = os.path.basename(frame["file_path"]) + ".jpg"
        assert os.path.isfile(
            os.path.join(converted.out, "views", "val", name)
        )
        mat = np.asarray(frame["transform_matrix"])
        assert mat.shape == (4, 4)
        # rotation block orthonormal
        rot = mat[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)


def test_framework_loads_converted_views(converted):
    from robust_e_nerf_tpu.data import posed_images as posed_mod

    imgs = posed_mod.load_posed_images(
        converted.out, "val", permutation_seed=None,
        alpha_over_white_bg=False,
    )
    assert len(imgs["img"]) > 0
    assert np.isfinite(imgs["T_wc_position"]).all()
    assert imgs["intrinsics"].shape == (3, 3)
