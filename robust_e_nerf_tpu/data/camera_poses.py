"""Camera pose samples (host side).

Counterpart of `data/datasets.py:693-736` (class CameraPose): loads
`camera_poses.npz` = {T_wc_position (C, 3), T_wc_orientation XYZW quats
(C, 4), T_wc_timestamp (C,) int64 ns}.

Time re-basing: the first pose timestamp becomes t0; all device-side times
are float32 seconds relative to t0 (see package docstring for why).
"""

from __future__ import annotations

import os

import numpy as np

CAMERA_POSES_FILENAME = "camera_poses.npz"
CAMERA_POSES_KEYS = {"T_wc_position", "T_wc_orientation", "T_wc_timestamp"}

NANOSECONDS_PER_SECOND = 1_000_000_000


def load_camera_poses(root_directory):
    data = np.load(os.path.join(root_directory, CAMERA_POSES_FILENAME))
    assert set(data.files) >= CAMERA_POSES_KEYS
    return {k: np.asarray(data[k]) for k in CAMERA_POSES_KEYS}


def rebase_timestamps_ns(timestamps_ns, t0_ns):
    """int64 ns -> float64 seconds relative to t0 (cast to f32 at the
    device boundary)."""
    return (
        (np.asarray(timestamps_ns).astype(np.int64) - np.int64(t0_ns))
        .astype(np.float64) / NANOSECONDS_PER_SECOND
    )


def intervals_seconds(start_ts_ns, end_ts_ns):
    """Exact int64 differencing then seconds — never re-difference rounded
    f32 absolute times."""
    return (
        (np.asarray(end_ts_ns).astype(np.int64)
         - np.asarray(start_ts_ns).astype(np.int64))
        .astype(np.float64) / NANOSECONDS_PER_SECOND
    )


def prepare_trajectory_arrays(camera_poses):
    """(positions f32, quats f32, timestamps f32 seconds, t0_ns).

    Quaternions are sign-aligned the way the raw file stores them — the
    slerp's shortest-path flip handles hemisphere changes.
    """
    ts_ns = camera_poses["T_wc_timestamp"].astype(np.int64)
    assert np.all(np.diff(ts_ns) > 0), "pose timestamps must be increasing"
    t0_ns = ts_ns[0]
    ts_s = rebase_timestamps_ns(ts_ns, t0_ns).astype(np.float32)
    return (
        camera_poses["T_wc_position"].astype(np.float32),
        camera_poses["T_wc_orientation"].astype(np.float32),
        ts_s,
        int(t0_ns),
    )
