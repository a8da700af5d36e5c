"""Quaternion algebra in JAX (XYZW convention, as in the reference's `roma`).

The reference relies on roma v1.2.7 plus two hotfixes implemented in
`robust_e_nerf/utils/tensor_ops.py:83-180`:

  1. rotation-vector extraction must allow angles in [0, 2*pi] instead of
     restricting to acute angles, otherwise slerp silently takes the shortest
     arc even when `shortest_path=False`;
  2. the shortest-path quaternion flip must flip `q1` (not `q0`) when
     `<q0, q1> < 0`.

Both behaviours are reproduced here.  All functions are pure, jittable, and
differentiable (including w.r.t. slerp `steps`, which the training loss
differentiates through time -> pose -> ray -> render).
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this rotation angle (radians), series expansions replace sin-based
# formulas (same switch point as the reference, tensor_ops.py:100).
_SMALL_ANGLE = 1e-3


def quat_conjugate(q):
    """Conjugate of XYZW quaternions: negate the vector part."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_product(p, q):
    """Hamilton product of XYZW quaternions (batched)."""
    pv, pw = p[..., :3], p[..., 3:4]
    qv, qw = q[..., :3], q[..., 3:4]
    vec = pw * qv + qw * pv + jnp.cross(pv, qv)
    scalar = pw * qw - jnp.sum(pv * qv, axis=-1, keepdims=True)
    return jnp.concatenate([vec, scalar], axis=-1)


def unitquat_to_rotmat(q):
    """Unit XYZW quaternion -> rotation matrix, shape (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack(
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def unitquat_to_full_rotvec(q):
    """Unit quaternion -> rotation vector with angle in [0, 2*pi].

    Mirrors the reference hotfix `unitquat_to_full_rotvec`
    (tensor_ops.py:83-111): angle = 2*atan2(|qv|, qw) which lands in
    [0, 2*pi] (qw may be negative), scale = angle / sin(angle / 2) with a
    series expansion near zero.
    """
    vec_norm = jnp.linalg.norm(q[..., :3], axis=-1)
    angle = 2.0 * jnp.arctan2(vec_norm, q[..., 3])
    small = jnp.abs(angle) <= _SMALL_ANGLE
    # Double-where trick: keep NaNs out of the gradient of the unused branch.
    safe_angle = jnp.where(small, 1.0, angle)
    scale_large = safe_angle / jnp.sin(safe_angle / 2.0)
    scale_small = 2.0 + angle**2 / 12.0 + 7.0 * angle**4 / 2880.0
    scale = jnp.where(small, scale_small, scale_large)
    return scale[..., None] * q[..., :3]


def rotvec_to_unitquat(rotvec):
    """Rotation vector -> unit XYZW quaternion (small-angle safe)."""
    angle = jnp.linalg.norm(rotvec, axis=-1)
    small = angle <= _SMALL_ANGLE
    safe_angle = jnp.where(small, 1.0, angle)
    # sin(angle/2)/angle with Taylor fallback 1/2 - angle^2/48 + angle^4/3840
    sinc_half_large = jnp.sin(safe_angle / 2.0) / safe_angle
    sinc_half_small = 0.5 - angle**2 / 48.0 + angle**4 / 3840.0
    sinc_half = jnp.where(small, sinc_half_small, sinc_half_large)
    vec = sinc_half[..., None] * rotvec
    scalar = jnp.cos(angle / 2.0)[..., None]
    return jnp.concatenate([vec, scalar], axis=-1)


def unitquat_slerp(q0, q1, steps, shortest_path=False):
    """Spherical interpolation with a distinct step per quaternion pair.

    Semantics follow the reference `tensor_ops.unitquat_slerp`
    (tensor_ops.py:114-180) for the element-wise case: `steps` has shape
    `q0.shape[:-1]`, 0.0 maps to q0 and 1.0 to q1.  When `shortest_path` is
    True, q1 is flipped wherever `<q0, q1> < 0`.  Differentiable w.r.t.
    `steps` (used by the l_grad loss path).
    """
    if shortest_path:
        dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
        q1 = jnp.where(dot < 0, -q1, q1)
    rel_q = quat_product(quat_conjugate(q0), q1)
    rel_rotvec = unitquat_to_full_rotvec(rel_q)
    rots = rotvec_to_unitquat(steps[..., None] * rel_rotvec)
    return quat_product(q0, rots)


def rotmat_to_unitquat(rotmat):
    """Rotation matrix -> unit XYZW quaternion (Shepperd's method, host use)."""
    m = rotmat
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    def build(w2x4, a, b, c):
        r = jnp.sqrt(jnp.maximum(w2x4, 1e-24))
        return r, a / r, b / r, c / r

    # candidate 0: w largest
    r0, x0, y0, z0 = build(
        1 + t, m[..., 2, 1] - m[..., 1, 2], m[..., 0, 2] - m[..., 2, 0],
        m[..., 1, 0] - m[..., 0, 1]
    )
    q_w = jnp.stack([x0, y0, z0, r0], axis=-1)
    # candidate 1: x largest
    r1, w1, y1, z1 = build(
        1 + m00 - m11 - m22, m[..., 2, 1] - m[..., 1, 2],
        m[..., 1, 0] + m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0]
    )
    q_x = jnp.stack([r1, y1, z1, w1], axis=-1)
    # candidate 2: y largest
    r2, w2, x2, z2 = build(
        1 - m00 + m11 - m22, m[..., 0, 2] - m[..., 2, 0],
        m[..., 1, 0] + m[..., 0, 1], m[..., 2, 1] + m[..., 1, 2]
    )
    q_y = jnp.stack([x2, r2, z2, w2], axis=-1)
    # candidate 3: z largest
    r3, w3, x3, y3 = build(
        1 - m00 - m11 + m22, m[..., 1, 0] - m[..., 0, 1],
        m[..., 0, 2] + m[..., 2, 0], m[..., 2, 1] + m[..., 1, 2]
    )
    q_z = jnp.stack([x3, y3, r3, w3], axis=-1)

    candidates = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([1 + t, 1 + m00 - m11 - m22,
                        1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(
        candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q = 0.5 * q
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
