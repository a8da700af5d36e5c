"""Space contractions mapping world coordinates into the unit cube [0, 1]^3.

Spec: reference `external/ngp.py:68-106` (`contract_to_unisphere`,
`contract_tanh`) and the plain AABB normalization (`ngp.py:236-237`).  The
occupancy grid lives in contracted space, so the inverses (needed to place
grid-cell sample points back into world space, what nerfacc's CUDA
`contract_inv` does) are implemented here too.
"""

from __future__ import annotations

import jax.numpy as jnp

AABB = "aabb"
SPHERE = "sphere"   # mip-NeRF-360 style unbounded sphere
TANH = "tanh"       # unbounded tanh

CONTRACTION_TYPES = (AABB, SPHERE, TANH)


def _split_aabb(aabb, num_dim=3):
    return aabb[..., :num_dim], aabb[..., num_dim:]


def contract_aabb(x, aabb, num_dim=3):
    """Normalize the AABB to [0, 1]^3 (ngp.py:236-237)."""
    lo, hi = _split_aabb(aabb, num_dim)
    return (x - lo) / (hi - lo)


def contract_aabb_inv(u, aabb, num_dim=3):
    lo, hi = _split_aabb(aabb, num_dim)
    return u * (hi - lo) + lo


def contract_unisphere(x, aabb, num_dim=3):
    """Unbounded-sphere contraction (ngp.py:68-93, derivative branch omitted).

    The AABB maps to [-1, 1]^3; points with |x| > 1 are squashed to the shell
    1 < |x'| < 2 via (2 - 1/|x|) * x/|x|; the result is scaled to [0, 1]^3.
    """
    lo, hi = _split_aabb(aabb, num_dim)
    x = (x - lo) / (hi - lo)
    x = x * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe_mag = jnp.maximum(mag, 1e-12)
    squashed = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
    x = jnp.where(mag > 1.0, squashed, x)
    return x / 4.0 + 0.5


def contract_unisphere_inv(u, aabb, num_dim=3):
    """Inverse of `contract_unisphere` (used for occupancy-grid sampling)."""
    y = (u - 0.5) * 4.0
    mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    safe_mag = jnp.maximum(mag, 1e-12)
    # |y| = 2 - 1/|x|  =>  |x| = 1 / (2 - |y|)
    inv_mag = 1.0 / jnp.maximum(2.0 - safe_mag, 1e-12)
    unsquashed = y / safe_mag * inv_mag
    x = jnp.where(mag > 1.0, unsquashed, y)
    lo, hi = _split_aabb(aabb, num_dim)
    return (x + 1.0) / 2.0 * (hi - lo) + lo


def contract_tanh(x, aabb, num_dim=3):
    """tanh contraction (ngp.py:96-106): AABB at [-0.5, 0.5], then
    (tanh(x)+1)/2."""
    lo, hi = _split_aabb(aabb, num_dim)
    x = (x - lo) / (hi - lo) - 0.5
    return (jnp.tanh(x) + 1.0) / 2.0


def contract_tanh_inv(u, aabb, num_dim=3):
    y = jnp.clip(u * 2.0 - 1.0, -1.0 + 1e-7, 1.0 - 1e-7)
    x = jnp.arctanh(y) + 0.5
    lo, hi = _split_aabb(aabb, num_dim)
    return x * (hi - lo) + lo


_FORWARD = {AABB: contract_aabb, SPHERE: contract_unisphere,
            TANH: contract_tanh}
_INVERSE = {AABB: contract_aabb_inv, SPHERE: contract_unisphere_inv,
            TANH: contract_tanh_inv}


def contract(x, aabb, contraction_type, num_dim=3):
    return _FORWARD[contraction_type](x, aabb, num_dim)


def contract_inv(u, aabb, contraction_type, num_dim=3):
    return _INVERSE[contraction_type](u, aabb, num_dim)
