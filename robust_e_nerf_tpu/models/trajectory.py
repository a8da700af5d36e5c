"""Continuous-time camera trajectory: linear interpolation of discrete poses.

Counterpart of the reference `models/trajectories.py` (LinearTrajectory).
Pose samples are constant buffers; the forward map timestamp -> (position,
rotation matrix) is pure, jittable, and differentiable w.r.t. the input
timestamps (required by the l_grad loss, which differentiates
time -> pose -> ray -> render via jvp).

Timestamps here are re-based float32 *seconds* (host-side code subtracts the
first pose time from the raw int64 nanosecond stamps before building these
buffers; see data/camera_poses.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import quaternions


def build_trajectory_buffers(t_wc_position, t_wc_orientation_quat,
                             t_wc_timestamp):
    """Pack pose samples into the trajectory buffer pytree.

    Args mirror `camera_poses.npz` content after host-side time re-basing:
    positions (C, 3) f32, XYZW unit quaternions (C, 4) f32, timestamps (C,)
    f32 seconds (strictly increasing).
    """
    t_wc_timestamp = jnp.asarray(t_wc_timestamp, dtype=jnp.float32)
    return {
        "position": jnp.asarray(t_wc_position, dtype=jnp.float32),
        "orientation_quat": jnp.asarray(
            t_wc_orientation_quat, dtype=jnp.float32
        ),
        "timestamp": t_wc_timestamp,
        "bin_width": jnp.diff(t_wc_timestamp),
    }


def interpolate_pose(buffers, timestamp, timestamp_lo=None):
    """Evaluate the trajectory at timestamps (N,) -> ((N, 3), (N, 3, 3)).

    Matches `LinearTrajectory.forward` (trajectories.py:30-91): searchsorted
    into the pose timestamps (left side), the t == first-timestamp corner
    case keeps both bin edges at index 0, positions lerp, orientations slerp
    along the shortest path with per-sample steps.

    `timestamp_lo` (optional) is the low word of a two-float time
    t = timestamp + timestamp_lo: the interpolation weight is computed as
    ((hi - bin_edge) + lo) / width, so microsecond offsets survive even
    when the absolute time exceeds f32 resolution (the reference keeps
    float64 times end to end, datamodule.py:157-196).  Bin *selection* may
    land one edge off when hi + lo straddles a pose timestamp; the weight
    then lies infinitesimally outside [0, 1], which lerp/slerp extend
    continuously.
    """
    ts = buffers["timestamp"]
    num_poses = ts.shape[0]

    t_search = (
        timestamp if timestamp_lo is None else timestamp + timestamp_lo
    )
    bin_right = jnp.searchsorted(ts, t_search, side="left")
    bin_right = jnp.clip(bin_right, 0, num_poses - 1)
    is_corner = t_search == ts[0]
    bin_left = jnp.where(is_corner, bin_right, bin_right - 1)
    bin_left = jnp.clip(bin_left, 0, num_poses - 1)

    width = buffers["bin_width"][jnp.clip(bin_left, 0, num_poses - 2)]
    delta = timestamp - ts[bin_left]
    if timestamp_lo is not None:
        delta = delta + timestamp_lo
    weight = delta / width
    weight = weight.astype(buffers["position"].dtype)

    p0 = buffers["position"][bin_left]
    p1 = buffers["position"][bin_right]
    position = p0 + weight[..., None] * (p1 - p0)

    q0 = buffers["orientation_quat"][bin_left]
    q1 = buffers["orientation_quat"][bin_right]
    quat = quaternions.unitquat_slerp(q0, q1, weight, shortest_path=True)
    rotation = quaternions.unitquat_to_rotmat(quat)

    return position, rotation
