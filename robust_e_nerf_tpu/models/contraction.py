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


def contract_coords(px, py, pz, aabb, contraction_type):
    """Coordinate-separated contraction: (px, py, pz) each (...,) arrays ->
    contracted (cx, cy, cz).

    Functionally identical to `contract` on stacked coordinates, but big
    batched inputs avoid (..., 3) tensors entirely — TPU tiling pads a
    trailing dim of 3 to 128 lanes, so (B, S, 3) intermediates cost 42x
    their logical size (docs/PERFORMANCE.md).
    """
    lo, hi = aabb[:3], aabb[3:]
    nx = (px - lo[0]) / (hi[0] - lo[0])
    ny = (py - lo[1]) / (hi[1] - lo[1])
    nz = (pz - lo[2]) / (hi[2] - lo[2])
    if contraction_type == AABB:
        return nx, ny, nz
    if contraction_type == SPHERE:
        x = nx * 2.0 - 1.0
        y = ny * 2.0 - 1.0
        z = nz * 2.0 - 1.0
        mag = jnp.sqrt(x * x + y * y + z * z)
        safe = jnp.maximum(mag, 1e-12)
        scale = jnp.where(mag > 1.0, (2.0 - 1.0 / safe) / safe, 1.0)
        return (x * scale / 4.0 + 0.5, y * scale / 4.0 + 0.5,
                z * scale / 4.0 + 0.5)
    if contraction_type == TANH:
        return ((jnp.tanh(nx - 0.5) + 1.0) / 2.0,
                (jnp.tanh(ny - 0.5) + 1.0) / 2.0,
                (jnp.tanh(nz - 0.5) + 1.0) / 2.0)
    raise NotImplementedError(contraction_type)


_FORWARD = {AABB: contract_aabb, SPHERE: contract_unisphere,
            TANH: contract_tanh}
_INVERSE = {AABB: contract_aabb_inv, SPHERE: contract_unisphere_inv,
            TANH: contract_tanh_inv}


def contract(x, aabb, contraction_type, num_dim=3):
    return _FORWARD[contraction_type](x, aabb, num_dim)


def contract_inv(u, aabb, contraction_type, num_dim=3):
    return _INVERSE[contraction_type](u, aabb, num_dim)
