"""Two-float (hi, lo) time representation: microsecond intervals must
survive at 20+ second absolute times (VERDICT round-1 weak #4).

The reference keeps int64-ns timestamps and float64 samplers end to end
(datamodule.py:157-196, event_generation_params.py:162-164); on TPU f64 is
emulated and slow, so device times are a double-float pair instead:
t = hi + lo with both words f32.  These tests pin down that the pair (a)
round-trips int64 nanoseconds, (b) keeps supervision-interval endpoints
distinct, and (c) feeds real position/velocity differences through the
trajectory — all in the regime (t0 ~ 20 s, 1 us intervals) where a single
f32 provably collapses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from robust_e_nerf_tpu.data import pipeline as pipeline_mod
from robust_e_nerf_tpu.models import trajectory as traj_mod

NS = 1_000_000_000


def _linear_trajectory(duration_s=21.0, n=211, speed=1.0, t_center=0.0):
    """Camera moving along +x at `speed` m/s, identity orientation.

    Positions are centered at `t_center` so they stay small (bounded AABB,
    like a real scene) while late timestamps exercise the f32 limits.
    """
    ts = np.linspace(0.0, duration_s, n).astype(np.float32)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = speed * (ts - t_center)
    quat = np.zeros((n, 4), np.float32)
    quat[:, 3] = 1.0  # XYZW identity
    return traj_mod.build_trajectory_buffers(pos, quat, ts)


def test_f32_alone_collapses_at_20s():
    """The failure mode the two-float representation exists for: at t ~ 20 s
    a single f32 has ~1.9 us resolution, so sub-half-ulp (< ~0.95 us)
    intervals vanish entirely and us-scale ones round with ~50% error."""
    t = np.float32(20.0000017)
    assert t + np.float32(4e-7) == t  # below half-ulp: collapses exactly
    err = float(t + np.float32(1e-6)) - float(t) - 1e-6
    assert abs(err) > 0.5e-6  # above half-ulp: ~90% rounding error


def test_split_two_float_roundtrips_nanoseconds():
    t_ns = np.array([0, 1, 999, 20 * NS + 1234, 20 * NS + 1235],
                    dtype=np.int64)
    t_f64 = t_ns.astype(np.float64) / NS
    hi, lo = pipeline_mod.split_two_float(t_f64)
    recovered = hi.astype(np.float64) + lo.astype(np.float64)
    np.testing.assert_allclose(recovered, t_f64, rtol=0, atol=1e-12)
    # consecutive ns-apart times stay distinct through the pair
    assert (hi[3] + lo[3]) != (hi[4] + lo[4]) or lo[3] != lo[4]


def test_event_table_preserves_microsecond_intervals():
    """start + interval lands on a *different* trajectory sample than
    start, even 20 s into the stream with a 1 us interval."""
    t0_ns = 5 * NS
    start_ns = np.array([t0_ns + 20 * NS + 7_777], dtype=np.int64)
    end_ns = start_ns + 400  # 400 ns: below half-ulp of f32 at t = 20 s
    events = {
        "position": np.array([[3.0, 4.0]], np.float32),
        "start_ts": start_ns,
        "end_ts": end_ns,
        "num_pos": np.array([1.0], np.float32),
        "num_neg": np.array([0.0], np.float32),
    }
    table = pipeline_mod.build_event_table(events, t0_ns, has_bayer=False)
    hi = table["start_ts_hi"]
    lo = table["start_ts_lo"]
    interval = table["interval"]
    np.testing.assert_allclose(interval, 4e-7, rtol=1e-6)
    # a single f32 would collapse the endpoint onto the start...
    assert hi[0] + interval[0] == hi[0]
    # ...but the lo word carries it
    assert lo[0] + interval[0] != lo[0]

    buffers = _linear_trajectory(t_center=20.0)
    p_start, _ = traj_mod.interpolate_pose(
        buffers, jnp.asarray(hi), jnp.asarray(lo)
    )
    p_end, _ = traj_mod.interpolate_pose(
        buffers, jnp.asarray(hi), jnp.asarray(lo + interval)
    )
    moved = float(p_end[0, 0] - p_start[0, 0])
    # 1 m/s x 400 ns = 4e-7 m; rounding headroom but emphatically nonzero
    assert 2e-7 < moved < 8e-7, moved


def test_trajectory_jvp_velocity_through_lo_word():
    """d(position)/d(lo) equals the trajectory velocity at t ~ 20 s, so
    the l_grad jvp sees finite, correct time derivatives late in the
    stream."""
    buffers = _linear_trajectory(speed=2.5, t_center=20.0)
    hi = jnp.asarray([20.0], jnp.float32)
    lo = jnp.asarray([3.3e-7], jnp.float32)

    def pos_at(lo_w):
        p, _ = traj_mod.interpolate_pose(buffers, hi, lo_w)
        return p

    _, tangent = jax.jvp(pos_at, (lo,), (jnp.ones_like(lo),))
    np.testing.assert_allclose(
        np.asarray(tangent), [[2.5, 0.0, 0.0]], rtol=1e-3, atol=1e-5
    )


def test_interpolate_pose_backward_compatible_single_time():
    """Callers that pass one f32 time (eval, the TUM-VIE converter) keep
    working unchanged."""
    buffers = _linear_trajectory(duration_s=1.0, n=11, speed=1.0)
    p, r = traj_mod.interpolate_pose(buffers, jnp.asarray([0.55]))
    np.testing.assert_allclose(np.asarray(p), [[0.55, 0.0, 0.0]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)
