"""ESIM preprocessor pipeline tests (VERDICT round-1 weak #7).

The bag *reader* needs a ROS installation that does not exist here, so the
pipeline is exercised through `preprocess_messages` with synthetic message
objects carrying the exact rosbag/rosbags attribute surface
(reference behavior: /root/reference/scripts/preprocess_esim.py:163-259).
The outputs are then consumed by the framework's own data layer end to end
(event pairing, max-tau, trajectory buffers, device event table).
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import importlib.util

_SPEC = importlib.util.spec_from_file_location(
    "preprocess_esim",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "preprocess_esim.py"),
)
pe = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pe)

NS = 1_000_000_000


def _stamp(t_ns):
    return SimpleNamespace(sec=int(t_ns) // NS, nanosec=int(t_ns) % NS)


def _make_messages(rng, n_events=4000, n_poses=41, duration_ns=2 * NS,
                   width=32, height=24):
    msgs = []
    # camera info
    intrinsics = np.array(
        [[40.0, 0, width / 2], [0, 40.0, height / 2], [0, 0, 1]],
        dtype=np.float32,
    )
    # 4 distortion params (the reference's undistort contract,
    # datasets.py:336): tiny k1/k2 so plumb_bob undistortion is exercised
    msgs.append(("/cam0/camera_info", SimpleNamespace(
        K=intrinsics.reshape(-1).tolist(),
        D=[1e-3, -1e-4, 0.0, 0.0],
        distortion_model="plumb_bob",
    )))
    # poses every duration/(n-1); IMU only on every second pose timestamp
    pose_ts = np.linspace(0, duration_ns, n_poses).astype(np.int64)
    for i, t in enumerate(pose_ts):
        msgs.append(("/cam0/pose", SimpleNamespace(
            header=SimpleNamespace(stamp=_stamp(t)),
            pose=SimpleNamespace(
                position=SimpleNamespace(
                    x=float(np.cos(i / 7)), y=float(np.sin(i / 7)), z=0.5
                ),
                orientation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0),
            ),
        )))
    imu_ts = pose_ts[::2]
    for t in imu_ts:
        msgs.append(("/imu", SimpleNamespace(
            header=SimpleNamespace(stamp=_stamp(t))
        )))
    # events in 2 chunks; some outside the IMU-synced pose span
    ev_ts = np.sort(rng.integers(
        -NS // 10, duration_ns + NS // 10, n_events
    )).astype(np.int64)
    ev_xy = np.stack(
        [rng.integers(0, width, n_events), rng.integers(0, height, n_events)],
        axis=1,
    )
    ev_pol = rng.random(n_events) > 0.4
    half = n_events // 2
    for lo, hi in ((0, half), (half, n_events)):
        events = [
            SimpleNamespace(
                x=int(ev_xy[i, 0]), y=int(ev_xy[i, 1]),
                ts=_stamp(ev_ts[i]), polarity=bool(ev_pol[i]),
            )
            for i in range(lo, hi)
        ]
        msgs.append(("/cam0/events", SimpleNamespace(
            events=events, height=height, width=width
        )))
    return msgs, imu_ts, ev_ts, intrinsics


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory, module_rng):
    rng = module_rng
    out = str(tmp_path_factory.mktemp("esim_ds"))
    msgs, imu_ts, ev_ts, intrinsics = _make_messages(rng)

    # a blender-type ESIM conf exercising the flagfile parser
    conf_path = os.path.join(out, "sim.conf")
    with open(conf_path, "w") as f:
        f.write(
            "# esim config\n"
            "--renderer_type=4\n"
            "--blender_interm_color_space=1\n"
            "--contrast_threshold_pos=0.25\n"
            "--contrast_threshold_neg=0.2\n"
            "--refractory_period_ns=1000000\n"
            "--log_eps=0.001\n"
            "--unrelated_flag=whatever\n"
        )
    pos_ct, neg_ct, tau, bayer = pe.preprocess_conf(conf_path, out)
    pe.preprocess_messages(msgs, out, pos_ct, neg_ct, tau, bayer)
    return SimpleNamespace(path=out, imu_ts=imu_ts, ev_ts=ev_ts,
                           intrinsics=intrinsics)


@pytest.fixture(scope="module")
def module_rng():
    return np.random.default_rng(20260816)


def test_conf_parsing(preprocessed):
    rp = np.load(os.path.join(preprocessed.path, "renderer_params.npz"))
    assert str(rp["interm_color_space"]) == "linear"
    assert float(rp["log_eps"]) == 0.001
    calib = np.load(os.path.join(preprocessed.path,
                                 "camera_calibration.npz"))
    assert float(calib["pos_contrast_threshold"]) == 0.25
    assert float(calib["neg_contrast_threshold"]) == pytest.approx(0.2)
    assert int(calib["refractory_period"]) == 1_000_000
    assert str(calib["bayer_pattern"]) == ""


def test_imu_synced_pose_filtering(preprocessed):
    """Only pose samples whose timestamps appear in the IMU stream survive
    (reference preprocess_esim.py:219-222)."""
    poses = np.load(os.path.join(preprocessed.path, "camera_poses.npz"))
    np.testing.assert_array_equal(poses["T_wc_timestamp"],
                                  preprocessed.imu_ts)
    assert poses["T_wc_position"].shape == (len(preprocessed.imu_ts), 3)
    assert poses["T_wc_orientation"].shape == (len(preprocessed.imu_ts), 4)


def test_event_time_span_filtering(preprocessed):
    """Events outside [first pose ts, last pose ts] are dropped
    (reference preprocess_esim.py:224-227)."""
    raw = np.load(os.path.join(preprocessed.path, "raw_events.npz"))
    ts = raw["timestamp"]
    lo, hi = preprocessed.imu_ts[0], preprocessed.imu_ts[-1]
    assert np.all((lo <= ts) & (ts <= hi))
    expected = np.sum(
        (preprocessed.ev_ts >= lo) & (preprocessed.ev_ts <= hi)
    )
    assert len(ts) == expected
    assert raw["position"].dtype == np.uint16


def test_calibration_contents(preprocessed):
    calib = np.load(os.path.join(preprocessed.path,
                                 "camera_calibration.npz"))
    np.testing.assert_allclose(calib["intrinsics"],
                               preprocessed.intrinsics)
    assert str(calib["distortion_model"]) == "plumb_bob"
    assert int(calib["img_width"]) == 32
    assert int(calib["img_height"]) == 24


def test_framework_consumes_preprocessed_dataset(preprocessed):
    """End to end into the data layer: event pairing + max-tau + trajectory
    + device event table all run on the preprocessor's outputs."""
    from robust_e_nerf_tpu.data import camera_poses as poses_mod
    from robust_e_nerf_tpu.data import events as events_mod
    from robust_e_nerf_tpu.data import pipeline as pipeline_mod
    from robust_e_nerf_tpu.models import trajectory as traj_mod

    events = events_mod.load_or_build_transformed_events(preprocessed.path)
    assert len(events["position"]) > 0
    assert np.all(events["end_ts"] > events["start_ts"])

    max_tau = events_mod.load_or_build_max_refractory_period(
        preprocessed.path
    )
    assert max_tau > 0

    camera_poses = poses_mod.load_camera_poses(preprocessed.path)
    positions, quats, ts_s, t0_ns = poses_mod.prepare_trajectory_arrays(
        camera_poses
    )
    buffers = traj_mod.build_trajectory_buffers(positions, quats, ts_s)

    table = pipeline_mod.build_event_table(events, t0_ns, has_bayer=False)
    import jax.numpy as jnp

    hi = jnp.asarray(table["start_ts_hi"][:64])
    lo = jnp.asarray(table["start_ts_lo"][:64])
    pos, rot = traj_mod.interpolate_pose(buffers, hi, lo)
    assert np.isfinite(np.asarray(pos)).all()
    assert np.isfinite(np.asarray(rot)).all()


def test_planar_conf(tmp_path, module_rng):
    """renderer_type 0 (planar): derived source intrinsics + blur params
    (reference preprocess_esim.py:94-128)."""
    cv2 = pytest.importorskip("cv2")
    tex = str(tmp_path / "texture.png")
    cv2.imwrite(tex, (module_rng.random((48, 64, 3)) * 255).astype(np.uint8))
    conf_path = str(tmp_path / "planar.conf")
    with open(conf_path, "w") as f:
        f.write(
            f"--renderer_type=0\n--renderer_texture={tex}\n"
            "--renderer_hfov_cam_source_deg=90.0\n"
            "--renderer_preprocess_median_blur=3\n"
            "--renderer_preprocess_gaussian_blur=1.5\n"
            "--contrast_threshold_pos=0.3\n"
            "--contrast_threshold_neg=0.3\n"
        )
    out = str(tmp_path / "ds")
    pe.preprocess_conf(conf_path, out)
    rp = np.load(os.path.join(out, "renderer_params.npz"))
    assert str(rp["planar_img_filename"]) == "texture.png"
    # f = (W/2) / tan(hfov/2) = 32 / tan(45 deg) = 32
    np.testing.assert_allclose(rp["planar_intrinsics"][0, 0], 32.0,
                               rtol=1e-6)
    np.testing.assert_allclose(rp["planar_intrinsics"][0, 2], 32.0)
    assert int(rp["median_blur_ksize"]) == 3
    np.testing.assert_allclose(float(rp["gaussian_blur_sigma"]), 1.5)
