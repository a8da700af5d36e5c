"""Continuous-time trajectory vs scipy interpolation oracles."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation, Slerp

from robust_e_nerf_tpu.models import trajectory as traj


def make_buffers(rng, num_poses=9):
    ts = np.sort(rng.uniform(0, 10, num_poses)).astype(np.float32)
    ts[0] = 0.0
    positions = rng.normal(size=(num_poses, 3)).astype(np.float32)
    quats = rng.normal(size=(num_poses, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    # hemisphere-align so scipy Slerp (always shortest) matches
    for i in range(1, num_poses):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    return traj.build_trajectory_buffers(positions, quats, ts), ts, \
        positions, quats


def test_interpolation_matches_scipy(rng):
    buffers, ts, positions, quats = make_buffers(rng)
    query = np.asarray(
        [0.0, ts[1], (ts[2] + ts[3]) / 2, ts[-1] - 1e-4], np.float32
    )
    pos, rot = traj.interpolate_pose(buffers, jnp.asarray(query))
    pos, rot = np.asarray(pos), np.asarray(rot)

    slerp = Slerp(ts.astype(np.float64), Rotation.from_quat(quats))
    for i, t in enumerate(query):
        # position lerp
        right = np.searchsorted(ts, t, side="left")
        left = right if t == ts[0] else right - 1
        w = 0.0 if left == right else (t - ts[left]) / (
            ts[right] - ts[left]
        )
        expected_pos = positions[left] + w * (
            positions[right] - positions[left]
        )
        np.testing.assert_allclose(pos[i], expected_pos, atol=1e-5)
        expected_rot = slerp([float(t)]).as_matrix()[0]
        np.testing.assert_allclose(rot[i], expected_rot, atol=1e-4)


def test_exact_at_knots(rng):
    buffers, ts, positions, quats = make_buffers(rng)
    pos, rot = traj.interpolate_pose(buffers, jnp.asarray(ts))
    np.testing.assert_allclose(np.asarray(pos), positions, atol=1e-5)
    expected = Rotation.from_quat(quats).as_matrix()
    np.testing.assert_allclose(np.asarray(rot), expected, atol=1e-5)


def test_differentiable_wrt_time(rng):
    """d(pose)/dt via jvp matches finite differences — the l_grad loss path
    differentiates time -> pose -> ray -> render."""
    buffers, ts, _, _ = make_buffers(rng)
    t = jnp.asarray([2.5, 4.5], jnp.float32)

    def f(t):
        pos, rot = traj.interpolate_pose(buffers, t)
        return pos, rot

    (pos, rot), (dpos, drot) = jax.jvp(f, (t,), (jnp.ones_like(t),))
    eps = 1e-3
    (pos_p, rot_p) = f(t + eps)
    (pos_m, rot_m) = f(t - eps)
    np.testing.assert_allclose(
        np.asarray(dpos), np.asarray((pos_p - pos_m) / (2 * eps)),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(drot), np.asarray((rot_p - rot_m) / (2 * eps)),
        atol=1e-2,
    )
