"""Parameter transforms (constrained <-> raw) and activations.

The reference stores constrained parameters via `torch.nn.utils.parametrize`
with modules that expose `forward` and `right_inverse`
(robust_e_nerf/utils/modules.py:38-74).  In JAX the raw (pre-activation)
value lives in the parameter pytree and these pure functions map it to the
constrained value inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# softplus family (torch semantics: linear above `threshold / beta`)
# ----------------------------------------------------------------------------

def softplus(x, beta=1.0, threshold=20.0):
    """torch.nn.functional.softplus: log1p(exp(beta*x))/beta, linear when
    beta*x > threshold (modules.py:38-45)."""
    scaled = beta * x
    safe = jnp.where(scaled > threshold, 0.0, scaled)
    return jnp.where(scaled > threshold, x, jnp.log1p(jnp.exp(safe)) / beta)


def inv_softplus(y, beta=1.0, threshold=20.0):
    """Right inverse of `softplus` (modules.py:47-55)."""
    scaled = beta * y
    safe = jnp.where(scaled > threshold, 1.0, scaled)
    return jnp.where(scaled > threshold, y, jnp.log(jnp.expm1(safe)) / beta)


def shifted_softplus(x, shift=1.0, beta=1.0, threshold=20.0):
    """mip-NeRF's shifted softplus density activation (models/nerf.py:8-13)."""
    return softplus(x - shift, beta, threshold)


# ----------------------------------------------------------------------------
# scaled & shifted sigmoid (refractory-period parameterization)
# ----------------------------------------------------------------------------

def scaled_shifted_sigmoid(x, low=0.0, high=1.0):
    """scale*sigmoid(x/scale)+low; preserves Sigmoid's gradient profile
    (modules.py:58-71)."""
    scale = high - low
    return scale * jax.nn.sigmoid(x / scale) + low


def inv_scaled_shifted_sigmoid(y, low=0.0, high=1.0):
    """Right inverse: scale * logit((y-low)/scale) (modules.py:73-74)."""
    scale = high - low
    p = (y - low) / scale
    return scale * (jnp.log(p) - jnp.log1p(-p))


# ----------------------------------------------------------------------------
# truncated exponential density activation
# ----------------------------------------------------------------------------

@jax.custom_jvp
def trunc_exp(x):
    """exp with a gradient clamp: d/dx = exp(min(x, 15)).

    Matches the reference `_TruncExp` (external/ngp.py:45-61, from torch-ngp):
    forward is exact exp, backward clamps the exponent at 15 to keep early
    training stable.  Implemented as a custom JVP so both forward-mode (the
    l_grad timestamp tangent) and reverse-mode work.
    """
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return jnp.exp(x), t * jnp.exp(jnp.clip(x, max=15.0))


def shifted_trunc_exp(x, shift=1.0):
    """trunc_exp(x - shift) (external/ngp.py:64-65)."""
    return trunc_exp(x - shift)


# ----------------------------------------------------------------------------
# losses used as error functions (reduction="none")
# ----------------------------------------------------------------------------

_MAPE_EPS = float(jnp.finfo(jnp.float64).eps)  # ~2.22e-16 (modules.py:86)


def l1_error(pred, target):
    return jnp.abs(pred - target)


def mse_error(pred, target):
    return jnp.square(pred - target)


def mape_error(pred, target, eps=_MAPE_EPS):
    """Mean-absolute-percentage error, elementwise (modules.py:77-102)."""
    return jnp.abs(pred - target) / jnp.maximum(jnp.abs(target), eps)


ERROR_FNS = {"l1": l1_error, "mse": mse_error, "mape": mape_error}


# ----------------------------------------------------------------------------
# activation registries (models/nerf.py:17-29)
# ----------------------------------------------------------------------------

def softplus_beta100(x):
    return softplus(x, beta=100.0)


HIDDEN_ACTIVATIONS = {
    "softplus": softplus_beta100,
    "relu": jax.nn.relu,
}

DENSITY_ACTIVATIONS = {
    "shifted_trunc_exp": shifted_trunc_exp,
    "softplus": softplus,
    "shifted_softplus": shifted_softplus,
}

RADIANCE_ACTIVATIONS = {
    "softplus": softplus,
    "sigmoid": jax.nn.sigmoid,
}
