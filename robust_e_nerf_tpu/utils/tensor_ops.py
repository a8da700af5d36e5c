"""Small tensor utilities shared across the framework.

Counterpart of the reference `robust_e_nerf/utils/tensor_ops.py`, minus the
quaternion code (which lives in `utils.quaternions`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def lerp(start, end, weight):
    """torch.lerp semantics: start + weight * (end - start)."""
    return start + weight * (end - start)


def normalize_range(x, min, max):  # noqa: A002 - mirror reference signature
    """(x - min) / (max - min) (tensor_ops.py:12-13)."""
    return (x - min) / (max - min)


def bool_mean(x):
    """Mean of a boolean array as float (tensor_ops.py:16-17)."""
    return jnp.mean(x.astype(jnp.float32))


def randperm_manual_seed(n, seed):
    """Seeded random permutation independent of global RNG state.

    The reference uses `torch.randperm` with a dedicated generator
    (tensor_ops.py:5-9); we use a dedicated NumPy generator.  Only determinism
    across runs of *this* framework matters (the permutation emulates sparse
    events via `train_dataset_perm_seed`).
    """
    rng = np.random.default_rng(seed)
    return rng.permutation(n)


def trunc_normal(low, high, size, mean, std, rng):
    """Truncated normal via inverse-CDF of a uniform (samplers.py:33-85).

    Host-side float64 sampling (the reference samples normalized supervision
    timestamps in float64).  `rng` is a `np.random.Generator`.
    """

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((low - mean) / std)
    hi = norm_cdf((high - mean) / std)
    u = 2.0 * (hi - lo) * rng.random(size, dtype=np.float64) + (2.0 * lo - 1.0)
    from scipy.special import erfinv

    x = erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    return np.clip(x, low, high)


def lerp_uniform(values, upsampling_factor):
    """Uniformly upsample along the first axis by linear interpolation
    (tensor_ops.py:20-50): (N, ...) -> ((N-1)*factor + 1, ...)."""
    values = jnp.asarray(values)
    n = values.shape[0]
    weight = jnp.arange(upsampling_factor, dtype=values.dtype)
    weight = weight / upsampling_factor
    weight = weight.reshape((upsampling_factor,) + (1,) * values.ndim)
    interp = values[None, :-1] + weight * (values[None, 1:]
                                           - values[None, :-1])
    interp = jnp.moveaxis(interp, 0, 1).reshape(
        ((n - 1) * upsampling_factor,) + values.shape[1:]
    )
    return jnp.concatenate([interp, values[-1:]], axis=0)


def slerp_uniform(quats, upsampling_factor):
    """Uniformly upsample unit quaternions along the first axis by slerp
    (tensor_ops.py:53-80): (N, ..., 4) -> ((N-1)*factor + 1, ..., 4)."""
    from . import quaternions

    quats = jnp.asarray(quats)
    assert quats.shape[-1] == 4
    n = quats.shape[0]
    steps = jnp.arange(upsampling_factor, dtype=quats.dtype)
    steps = steps / upsampling_factor
    q0 = quats[:-1]
    q1 = quats[1:]
    out = jax.vmap(
        lambda s: quaternions.unitquat_slerp(
            q0, q1, jnp.broadcast_to(s, q0.shape[:-1]), shortest_path=True
        )
    )(steps)  # (factor, N-1, ..., 4)
    out = jnp.moveaxis(out, 0, 1).reshape(
        ((n - 1) * upsampling_factor,) + quats.shape[1:]
    )
    return jnp.concatenate([out, quats[-1:]], axis=0)


def gradient(fn, inputs):
    """d(sum-like scalar outputs)/d(inputs) with a ones seed — the JAX
    counterpart of the reference's `autograd.gradient` (autograd.py:4-34).
    In practice the framework differentiates time->pose->render with
    `jax.jvp` (one tangent) instead; this helper exists for API parity."""
    def summed(x):
        return jnp.sum(fn(x))

    return jax.grad(summed)(inputs)


def jacobian(fn, inputs):
    """Forward-mode Jacobian of fn at inputs (autograd.py:37-84
    counterpart): output shape (*inputs.shape, K) for fn mapping to
    (..., K)."""
    jac = jax.jacfwd(fn)(inputs)
    # jax.jacfwd returns (out_shape..., in_shape...); the reference's
    # convention is (*inputs.shape, K) for elementwise-batched fns
    return jnp.moveaxis(jac, 0, -1) if jac.ndim > 1 else jac


def pixel_meshgrid(height, width, dtype=np.float32):
    """(H, W, 2) grid of (x, y) pixel coordinates, xy-indexed
    (robust_e_nerf.py:110-117)."""
    xs, ys = np.meshgrid(
        np.arange(width, dtype=dtype), np.arange(height, dtype=dtype),
        indexing="xy",
    )
    return np.stack([xs, ys], axis=2)
