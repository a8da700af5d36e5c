"""lerp_uniform / slerp_uniform upsampling (tensor_ops.py:20-80)."""

import numpy as np
from scipy.spatial.transform import Rotation, Slerp

from robust_e_nerf_tpu.utils import tensor_ops


def test_lerp_uniform(rng):
    values = rng.normal(size=(5, 3)).astype(np.float32)
    out = np.asarray(tensor_ops.lerp_uniform(values, 4))
    assert out.shape == (17, 3)
    np.testing.assert_allclose(out[::4], values, atol=1e-6)
    expected_mid = values[0] + 0.5 * (values[1] - values[0])
    np.testing.assert_allclose(out[2], expected_mid, atol=1e-6)


def test_slerp_uniform(rng):
    quats = rng.normal(size=(4, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    for i in range(1, 4):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    out = np.asarray(tensor_ops.slerp_uniform(quats.astype(np.float32), 3))
    assert out.shape == (10, 4)
    sign = np.sign(np.sum(out[::3] * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(sign * out[::3], quats, atol=1e-5)
    slerp = Slerp([0, 1], Rotation.from_quat(quats[:2]))
    expected = slerp([1 / 3]).as_quat()[0]
    sign = np.sign(np.sum(out[1] * expected))
    np.testing.assert_allclose(out[1], sign * expected, atol=1e-5)


def test_gradient_helper():
    import jax.numpy as jnp

    from robust_e_nerf_tpu.utils import tensor_ops as t

    g = t.gradient(lambda x: x**2, jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(g), [2.0, 4.0, 6.0], rtol=1e-6)
