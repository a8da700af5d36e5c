"""Normalized supervision samplers: distributions + device/host parity."""

import numpy as np
import pytest

from robust_e_nerf_tpu.data import samplers
from robust_e_nerf_tpu.utils import tensor_ops


def test_uniform_sampler(rng):
    s = samplers.UniformSampler(0.0, 1.0, rng)
    x = s(200_000)
    assert x.dtype == np.float64
    assert x.min() >= 0 and x.max() <= 1
    assert abs(x.mean() - 0.5) < 0.01
    assert abs(x.var() - 1 / 12) < 0.01


def test_dirac_sampler():
    s = samplers.DiracDeltaSampler(1.0)
    x = s(100)
    np.testing.assert_array_equal(x, 1.0)
    assert x.dtype == np.float64


def test_trunc_normal_sampler(rng):
    """Moments of TruncNormal(0.5, 0.25, [0, 1]) — the grad_ts sampler
    (datamodule.py:183-196).  For a +-2-sigma truncation the variance
    shrinks to ~0.774 sigma^2."""
    s = samplers.TruncatedNormalSampler(0.0, 1.0, 0.5, 0.25, rng)
    x = s(400_000)
    assert x.min() >= 0 and x.max() <= 1
    assert abs(x.mean() - 0.5) < 0.005
    expected_var = 0.25**2 * (
        1 - 2 * 2 * _phi(2.0) / (2 * _cdf(2.0) - 1)
    )
    assert x.var() == pytest.approx(expected_var, rel=0.02)


def _phi(z):
    return np.exp(-z * z / 2) / np.sqrt(2 * np.pi)


def _cdf(z):
    from math import erf, sqrt

    return (1 + erf(z / sqrt(2))) / 2


def test_device_trunc_normal_matches_host_distribution(rng):
    """The device-side sampler (used inside the jitted step) must share
    the host sampler's distribution."""
    import jax

    from robust_e_nerf_tpu.engine.train import _device_trunc_normal

    x = np.asarray(
        _device_trunc_normal(jax.random.PRNGKey(0), (400_000,), 0.0, 1.0,
                             0.5, 0.25)
    )
    y = tensor_ops.trunc_normal(0.0, 1.0, 400_000, 0.5, 0.25, rng)
    assert abs(x.mean() - y.mean()) < 0.005
    assert abs(x.var() - y.var()) < 0.005
    # quantile agreement
    for q in (0.1, 0.25, 0.75, 0.9):
        assert abs(np.quantile(x, q) - np.quantile(y, q)) < 0.01
