"""Event pairing / max-refractory-period vs a brute-force deque oracle
(the reference's exact algorithm re-expressed in the test, datasets.py
sections 132-284)."""

import collections

import numpy as np
import pytest

from robust_e_nerf_tpu.data import events as ev


def brute_force_pairing(positions, timestamps, polarities, img_h, img_w):
    """Literal sliding-window semantics: per-pixel 2-deep deques in stream
    order; drop first-at-pixel and zero-duration pairs."""
    windows = [
        [collections.deque(maxlen=2) for _ in range(img_w)]
        for _ in range(img_h)
    ]
    pols = [
        [collections.deque(maxlen=2) for _ in range(img_w)]
        for _ in range(img_h)
    ]
    out = []
    for i in range(len(positions)):
        x, y = positions[i]
        w = windows[y][x]
        p = pols[y][x]
        w.append(timestamps[i])
        p.append(polarities[i])
        if len(w) < 2 or w[0] == w[-1]:
            continue
        num_pos = sum(p) - p[0]
        out.append((i, w[0], timestamps[i], num_pos, 1 - num_pos))
    return out


def brute_force_max_tau(positions, timestamps, img_h, img_w):
    windows = [
        [collections.deque(maxlen=2) for _ in range(img_w)]
        for _ in range(img_h)
    ]
    best = np.inf
    for i in range(len(positions)):
        x, y = positions[i]
        w = windows[y][x]
        if len(w) > 0 and timestamps[i] == w[-1]:
            continue
        w.append(timestamps[i])
        if len(w) < 2:
            continue
        best = min(best, w[1] - w[0])
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pairing_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n, img_h, img_w = 4000, 6, 7
    positions = np.stack(
        [rng.integers(0, img_w, n), rng.integers(0, img_h, n)], axis=1
    )
    # coarse timestamps so duplicate (pixel, ts) collisions actually occur
    timestamps = np.sort(rng.integers(0, 500, n)).astype(np.int64)
    polarities = rng.integers(0, 2, n)

    ours = ev.pair_events(positions, timestamps, polarities, img_w)
    expected = brute_force_pairing(
        positions, timestamps, polarities, img_h, img_w
    )
    assert len(ours["start_ts"]) == len(expected)
    exp_idx = np.array([e[0] for e in expected])
    np.testing.assert_array_equal(ours["index"], exp_idx)
    np.testing.assert_array_equal(
        ours["start_ts"], [e[1] for e in expected]
    )
    np.testing.assert_array_equal(ours["end_ts"], [e[2] for e in expected])
    np.testing.assert_array_equal(ours["num_pos"], [e[3] for e in expected])
    np.testing.assert_array_equal(ours["num_neg"], [e[4] for e in expected])
    np.testing.assert_array_equal(ours["position"], positions[exp_idx])


@pytest.mark.parametrize("seed", [0, 3])
def test_max_refractory_period_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n, img_h, img_w = 3000, 5, 5
    positions = np.stack(
        [rng.integers(0, img_w, n), rng.integers(0, img_h, n)], axis=1
    )
    timestamps = np.sort(rng.integers(0, 800, n)).astype(np.int64)
    ours = ev.extract_max_refractory_period(positions, timestamps, img_w)
    expected = brute_force_max_tau(positions, timestamps, img_h, img_w)
    assert ours == expected


def test_colorize_events_bayer_quadrants():
    events = {
        "position": np.array([[0, 0], [1, 0], [0, 1], [1, 1], [2, 2]]),
    }
    calib = {"bayer_pattern": np.asarray("GRBG")}
    out = ev.colorize_events(events, calib)
    # quadrants: TL=G(1) TR=R(0) BL=B(2) BR=G(1); (2,2) is even-even -> TL
    np.testing.assert_array_equal(out["channel_idx"], [1, 0, 2, 1, 1])


def test_colorize_monochrome_noop():
    events = {"position": np.zeros((3, 2), np.int64)}
    calib = {"bayer_pattern": np.asarray("")}
    out = ev.colorize_events(events, calib)
    assert "channel_idx" not in out


def test_undistort_identity_when_no_params():
    events = {"position": np.array([[1, 2], [3, 4]], np.int64)}
    calib = {
        "distortion_model": np.asarray("none"),
        "distortion_params": np.zeros(0),
        "intrinsics": np.eye(3),
        "img_width": np.int64(8),
    }
    out = ev.undistort_events(events, calib)
    assert out["position"].dtype == np.float32
    np.testing.assert_array_equal(out["position"],
                                  [[1.0, 2.0], [3.0, 4.0]])


def test_undistort_plumb_bob_matches_dense_cv2():
    import cv2

    rng = np.random.default_rng(0)
    intrinsics = np.array(
        [[120.0, 0, 31.5], [0, 120.0, 23.5], [0, 0, 1]]
    )
    dist = np.array([-0.2, 0.05, 0.001, -0.001])
    pos = np.stack(
        [rng.integers(0, 64, 500), rng.integers(0, 48, 500)], axis=1
    ).astype(np.int64)
    calib = {
        "distortion_model": np.asarray("plumb_bob"),
        "distortion_params": dist,
        "intrinsics": intrinsics,
        "img_width": np.int64(64),
    }
    out = ev.undistort_events({"position": pos}, calib)
    expected = cv2.undistortPoints(
        pos.astype(np.float32)[:, None, :], intrinsics, dist, P=intrinsics
    )[:, 0, :]
    np.testing.assert_allclose(out["position"], expected, atol=1e-4)
