"""Learnable event-camera non-idealities: contrast thresholds & refractory
period.

Counterpart of the reference `models/event_generation_params.py`.  Both are
tiny parameter pytrees plus pure functions:

* ContrastThreshold — the positive-to-negative contrast threshold ratio
  C_p / C_n is a positivity-constrained (softplus) scalar initialized from
  calibration (event_generation_params.py:38-57); the forward map converts
  per-interval event counts into a log-intensity difference
  num_pos * C_p - num_neg * C_n (:72-84).
* RefractoryPeriod — tau constrained to [0, max_tau) via a scaled & shifted
  sigmoid whose scaled logit is clamped so the sigmoid gradient never drops
  below 1e-4 (:157-185).  The forward map delays interval start timestamps
  by tau (:196-203).

All times here are float32 seconds (host code converts the dataset's int64
nanoseconds).  Unlike the reference, the effective interval
(end - (start + tau)) is carried explicitly so no precision is lost to
float32 absolute-time rounding.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from ..utils import transforms

# |logit(1e-4)|: the clamp bound on the scaled logit that keeps the scaled &
# shifted sigmoid gradient magnitude >= 1e-4
# (event_generation_params.py:90,149-155)
MIN_SIGMOID_GRAD = 1e-4
MAX_SCALED_LOGIT_MAGNITUDE = float(
    abs(np.log(MIN_SIGMOID_GRAD / (1.0 - MIN_SIGMOID_GRAD)))
)
REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR = 0.999


# ----------------------------------------------------------------------------
# contrast threshold
# ----------------------------------------------------------------------------

def build_contrast_threshold(pos_contrast_threshold, neg_contrast_threshold):
    """Returns (params, buffers) for the contrast-threshold component."""
    ratio = float(pos_contrast_threshold) / float(neg_contrast_threshold)
    assert ratio > 0
    params = {
        "raw_p2n_ratio": jnp.asarray(
            transforms.inv_softplus(jnp.float32(ratio)), dtype=jnp.float32
        )
    }
    buffers = {
        "init_p2n_ratio": jnp.float32(ratio),
        "neg_contrast_threshold": jnp.float32(neg_contrast_threshold),
    }
    return params, buffers


def p2n_ratio(params):
    return transforms.softplus(params["raw_p2n_ratio"])


def contrast_thresholds(params, buffers):
    """(C_p, C_n, mean) derived from the constrained ratio
    (event_generation_params.py:64-70)."""
    neg = buffers["neg_contrast_threshold"]
    pos = p2n_ratio(params) * neg
    return pos, neg, (pos + neg) / 2.0


def apply_contrast_threshold(params, buffers, num_pos, num_neg):
    """Counts -> effective log-intensity difference over the interval
    (event_generation_params.py:72-84)."""
    pos, neg, _ = contrast_thresholds(params, buffers)
    return num_pos * pos - num_neg * neg


# ----------------------------------------------------------------------------
# refractory period
# ----------------------------------------------------------------------------

def build_refractory_period(calibrated_refractory_period,
                            max_refractory_period):
    """Returns (params, buffers).  Times in float seconds.

    Re-defines an out-of-range calibration to 0.999 * max_tau with a warning
    (event_generation_params.py:116-129).
    """
    calibrated = float(calibrated_refractory_period)
    max_tau = float(max_refractory_period)
    if not (0 <= calibrated < max_tau):
        warnings.warn(
            f"Calibrated refractory period ({calibrated}) >= max. possible "
            f"refractory period ({max_tau}); redefining to "
            f"{REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR} * max."
        )
        calibrated = (
            REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR * max_tau
        )
    raw = transforms.inv_scaled_shifted_sigmoid(
        jnp.float32(calibrated), low=0.0, high=max_tau
    )
    params = {"raw_tau": clamp_raw_tau(jnp.asarray(raw, jnp.float32),
                                       jnp.float32(max_tau))}
    buffers = {
        "init_refractory_period": jnp.float32(calibrated),
        "max_refractory_period": jnp.float32(max_tau),
    }
    return params, buffers


def clamp_raw_tau(raw_tau, max_tau):
    """Clamp the scaled logit so the sigmoid gradient does not vanish
    (event_generation_params.py:170-185).  Applied as a projection after
    every optimizer update and before every read.

    Implemented with `where` instead of `clip`: jnp.clip halves the
    gradient exactly at the boundary (max/min tie convention), whereas
    torch's clamp passes the full gradient there — and after the projection
    the parameter sits exactly on the boundary.
    """
    bound = max_tau * MAX_SCALED_LOGIT_MAGNITUDE
    clamped = jnp.where(raw_tau < -bound, -bound, raw_tau)
    return jnp.where(clamped > bound, bound, clamped)


def refractory_period(params, buffers):
    max_tau = buffers["max_refractory_period"]
    raw = clamp_raw_tau(params["raw_tau"], max_tau)
    return transforms.scaled_shifted_sigmoid(raw, low=0.0, high=max_tau)


def apply_refractory_period(params, buffers, start_ts_lo, interval):
    """Delay interval starts by tau (event_generation_params.py:196-203).

    Operates on the *lo* word of the two-float event start time (tau is
    microsecond-scale, so it accumulates losslessly there); returns
    (start_ts_lo + tau, interval - tau) — the effective interval is updated
    in the same subtraction so precision comes from the host-exact
    `interval`, not from re-differencing rounded absolute times.
    """
    tau = refractory_period(params, buffers)
    return start_ts_lo + tau, interval - tau
