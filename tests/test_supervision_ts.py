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
