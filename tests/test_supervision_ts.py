"""Supervision-timestamp derivation vs the reference formulas
(robust_e_nerf.py:322-358), isolated from rendering."""

import jax.numpy as jnp
import numpy as np

from robust_e_nerf_tpu.models import event_model
from robust_e_nerf_tpu.utils import tensor_ops


def reference_formulas(start_ts, end_ts, n_ts_diff, n_diff_start, n_grad):
    """Direct transcription of the published math (torch.lerp semantics)."""
    ts_diff = (end_ts - start_ts) * n_ts_diff
    diff_start = start_ts + n_diff_start * (
        np.maximum(end_ts - ts_diff, start_ts) - start_ts
    )
    diff_end = np.minimum(diff_start + ts_diff, end_ts)
    grad_ts = diff_start + n_grad * (diff_end - diff_start)
    return ts_diff, diff_start, diff_end, grad_ts


def framework_offsets(interval, n_ts_diff, n_diff_start, n_grad):
    """The offset-form derivation used in train_loss_fn: supervision times
    as lo-word offsets from the event start."""
    interval = jnp.asarray(interval)
    ts_diff = interval * jnp.asarray(n_ts_diff)
    off_start = jnp.asarray(n_diff_start) * jnp.maximum(
        interval - ts_diff, 0.0
    )
    off_end = jnp.minimum(off_start + ts_diff, interval)
    off_grad = tensor_ops.lerp(off_start, off_end, jnp.asarray(n_grad))
    return (np.asarray(ts_diff), np.asarray(off_start),
            np.asarray(off_end), np.asarray(off_grad))


def test_supervision_ts_matches_reference(rng):
    n = 256
    start = rng.uniform(0, 10, n).astype(np.float32)
    interval = rng.uniform(1e-4, 0.5, n).astype(np.float32)
    end = start + interval
    n_ts_diff = rng.uniform(0.2, 1.0, n).astype(np.float32)
    n_diff_start = rng.uniform(0, 1, n).astype(np.float32)
    n_grad = rng.uniform(0, 1, n).astype(np.float32)

    ts_diff, off_start, off_end, off_grad = framework_offsets(
        interval, n_ts_diff, n_diff_start, n_grad
    )
    diff_start = start + off_start
    diff_end = start + off_end
    grad_ts = start + off_grad

    exp_diff, exp_start, exp_end, exp_grad = reference_formulas(
        start, end, n_ts_diff, n_diff_start, n_grad
    )
    # the framework carries `interval` exactly from the host and derives
    # offsets from it instead of re-differencing rounded f32 absolute
    # times, so it differs from the transcription by f32 subtraction
    # rounding (and is the MORE precise of the two)
    np.testing.assert_allclose(ts_diff, exp_diff, rtol=3e-5)
    np.testing.assert_allclose(diff_start, exp_start, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(diff_end, exp_end, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(grad_ts, exp_grad, rtol=1e-4, atol=1e-6)
    # invariants the reference's min/max guards establish
    assert np.all(off_start >= 0)
    assert np.all(off_end <= interval * (1 + 1e-6))
    assert np.all(off_grad >= off_start - 1e-7)
    assert np.all(off_grad <= off_end + 1e-7)


def test_dirac_ts_diff_recovers_full_interval(rng):
    """With normalized ts_diff == 1 (the production DiracDelta sampler),
    diff_start == start and diff_end == end regardless of the uniform
    sample."""
    n = 64
    interval = rng.uniform(1e-3, 0.5, n).astype(np.float32)
    u = rng.uniform(0, 1, n).astype(np.float32)
    _, off_start, off_end, _ = framework_offsets(
        interval, np.ones(n, np.float32), u, u
    )
    np.testing.assert_allclose(off_start, 0.0, atol=1e-7)
    np.testing.assert_allclose(off_end, interval, rtol=1e-7)


def test_target_gradient_uses_effective_interval():
    """After the refractory delay, the target gradient divides by
    interval - tau (loss.py:39-42 with the tau-shifted start)."""
    params, buffers = event_model.build_refractory_period(2e-3, 5e-3)
    tau = float(event_model.refractory_period(params, buffers))
    start, interval = event_model.apply_refractory_period(
        params, buffers, jnp.asarray([1.0]), jnp.asarray([0.01])
    )
    log_diff = 0.2
    target = log_diff / float(interval[0])
    assert abs(target - log_diff / (0.01 - tau)) < 1e-6 * abs(target)


def test_density_sparsity_weight_schedules():
    """Opt-in sparsity schedule (docs/ROADMAP.md round-3 item 1): exp decay
    and occupancy-fraction gating; no schedule -> constant weight."""
    import jax.numpy as jnp

    from robust_e_nerf_tpu.loss_metric import loss as loss_mod

    base = dict(
        weight_grad=0.0, weight_diff=1.0, error_fn_grad="mape",
        error_fn_diff="mse", param_weight_grad=None,
        param_weight_diff=None, weight_density_sparsity=0.01,
    )
    spec = loss_mod.LossSpec(**base)
    assert loss_mod.density_sparsity_weight(
        spec, jnp.int32(500), jnp.float32(0.5)
    ) == 0.01

    spec = loss_mod.LossSpec(
        **base, sparsity_schedule_mode="exp",
        sparsity_decay_steps=1000.0, sparsity_decay_rate=0.1,
        sparsity_floor=1e-4,
    )
    lam0 = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(0), jnp.float32(0.0)))
    lam1k = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(1000), jnp.float32(0.0)))
    lam_inf = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(100000), jnp.float32(0.0)))
    assert abs(lam0 - 0.01) < 1e-8
    assert abs(lam1k - 0.001) < 1e-6
    assert abs(lam_inf - 1e-4) < 1e-9  # clamped at the floor

    spec = loss_mod.LossSpec(
        **base, sparsity_schedule_mode="occ",
        sparsity_occ_frac_lo=0.02, sparsity_occ_frac_hi=0.10,
    )
    lam_lean = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(0), jnp.float32(0.01)))
    lam_mid = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(0), jnp.float32(0.06)))
    lam_fat = float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(0), jnp.float32(0.5)))
    assert lam_lean == 0.0
    assert abs(lam_mid - 0.005) < 1e-8
    assert abs(lam_fat - 0.01) < 1e-9


def test_build_loss_spec_parses_schedule():
    from robust_e_nerf_tpu.loss_metric import loss as loss_mod

    cfg = {
        "weight": {"log_intensity_grad": 0.0, "log_intensity_diff": 1.0,
                   "density_sparsity": 0.02},
        "error_fn": {"log_intensity_grad": "mape",
                     "log_intensity_diff": "mse"},
        "param_weight": {"log_intensity_grad": None,
                         "log_intensity_diff": None},
        "density_sparsity_schedule": {
            "mode": "exp", "decay_steps": 500, "decay_rate": 0.5,
        },
    }
    spec = loss_mod.build_loss_spec(cfg)
    assert spec.sparsity_schedule_mode == "exp"
    assert spec.sparsity_decay_steps == 500.0
    assert spec.sparsity_decay_rate == 0.5
    # no schedule block -> constant mode
    del cfg["density_sparsity_schedule"]
    spec = loss_mod.build_loss_spec(cfg)
    assert spec.sparsity_schedule_mode is None


def test_distortion_weight_shares_schedule_with_hold():
    """weight_distortion rides the same schedule as density_sparsity,
    including the hold_steps window (full strength until the hold ends,
    then exponential decay)."""
    import jax.numpy as jnp

    from robust_e_nerf_tpu.loss_metric import loss as loss_mod

    spec = loss_mod.LossSpec(
        weight_grad=0.0, weight_diff=1.0, error_fn_grad="mape",
        error_fn_diff="mse", param_weight_grad=None,
        param_weight_diff=None, weight_density_sparsity=0.01,
        weight_distortion=0.002, sparsity_schedule_mode="exp",
        sparsity_hold_steps=1000.0, sparsity_decay_steps=500.0,
        sparsity_decay_rate=0.1, sparsity_floor=0.0,
    )
    # full strength through the hold window
    assert abs(float(loss_mod.distortion_weight(
        spec, jnp.int32(0), jnp.float32(0.0))) - 0.002) < 1e-9
    assert abs(float(loss_mod.distortion_weight(
        spec, jnp.int32(1000), jnp.float32(0.0))) - 0.002) < 1e-9
    # one decay period past the hold -> x0.1
    assert abs(float(loss_mod.distortion_weight(
        spec, jnp.int32(1500), jnp.float32(0.0))) - 0.0002) < 1e-9
    # sparsity weight follows the same shifted schedule
    assert abs(float(loss_mod.density_sparsity_weight(
        spec, jnp.int32(1500), jnp.float32(0.0))) - 0.001) < 1e-8
