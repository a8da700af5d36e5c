"""Event-generation-parameter components vs the reference math
(event_generation_params.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.models import event_model as em
from robust_e_nerf_tpu.utils import transforms


def test_contrast_threshold_forward():
    params, buffers = em.build_contrast_threshold(0.3, 0.2)
    assert float(em.p2n_ratio(params)) == pytest.approx(1.5, rel=1e-5)
    pos, neg, mean = em.contrast_thresholds(params, buffers)
    assert float(pos) == pytest.approx(0.3, rel=1e-5)
    assert float(neg) == pytest.approx(0.2, rel=1e-5)
    assert float(mean) == pytest.approx(0.25, rel=1e-5)
    # counts -> log-intensity difference (ep.py:72-84)
    out = em.apply_contrast_threshold(
        params, buffers, jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])
    )
    np.testing.assert_allclose(np.asarray(out), [0.3, -0.2], rtol=1e-5)


def test_contrast_threshold_gradient_flows():
    params, buffers = em.build_contrast_threshold(0.2, 0.2)

    def loss(p):
        return em.apply_contrast_threshold(
            p, buffers, jnp.asarray(1.0), jnp.asarray(0.0)
        )

    g = jax.grad(lambda p: loss(p))(params)
    assert float(g["raw_p2n_ratio"]) != 0.0


def test_refractory_period_roundtrip():
    max_tau = 1.375e-6
    params, buffers = em.build_refractory_period(0.4e-6, max_tau)
    tau = float(em.refractory_period(params, buffers))
    assert tau == pytest.approx(0.4e-6, rel=1e-3)


def test_refractory_period_out_of_range_redefined():
    with pytest.warns(UserWarning):
        params, buffers = em.build_refractory_period(2e-6, 1e-6)
    tau = float(em.refractory_period(params, buffers))
    assert tau == pytest.approx(0.999e-6, rel=1e-3)


def test_refractory_zero_calibration_clamped_not_neg_inf():
    """tau = 0 maps to logit -inf; the clamp must keep it finite with
    gradient magnitude >= 1e-4 (ep.py:90,170-185)."""
    max_tau = 1e-6
    params, buffers = em.build_refractory_period(0.0, max_tau)
    raw = float(params["raw_tau"])
    assert np.isfinite(raw)
    bound = max_tau * em.MAX_SCALED_LOGIT_MAGNITUDE
    assert abs(raw) <= bound * (1 + 1e-6)
    # sigmoid gradient at the clamp >= MIN_SIGMOID_GRAD
    g = jax.grad(
        lambda r: em.refractory_period({"raw_tau": r}, buffers)
    )(jnp.asarray(raw))
    assert float(g) >= em.MIN_SIGMOID_GRAD * 0.99


def test_apply_refractory_period_interval_arithmetic():
    max_tau = 1e-3
    params, buffers = em.build_refractory_period(0.5e-3, max_tau)
    start, interval = em.apply_refractory_period(
        params, buffers, jnp.asarray([1.0]), jnp.asarray([2.0e-3])
    )
    tau = float(em.refractory_period(params, buffers))
    assert float(start[0]) == pytest.approx(1.0 + tau, abs=1e-6)
    assert float(interval[0]) == pytest.approx(2.0e-3 - tau, rel=1e-4)


def test_max_scaled_logit_magnitude_value():
    # |logit(1e-4)| (ep.py:149-155)
    expected = abs(float(np.log(1e-4) - np.log(1 - 1e-4)))
    assert em.MAX_SCALED_LOGIT_MAGNITUDE == pytest.approx(expected)


def test_softplus_param_matches_reference_parametrization(rng):
    """Round-trip through raw storage matches torch's
    register_parametrization(right_inverse) protocol."""
    for ratio in (0.5, 1.0, 1.458, 25.0):
        params, buffers = em.build_contrast_threshold(ratio * 0.2, 0.2)
        back = float(transforms.softplus(params["raw_p2n_ratio"]))
        assert back == pytest.approx(ratio, rel=1e-4)
