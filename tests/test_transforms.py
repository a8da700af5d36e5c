"""Parameter transforms vs torch oracles (torch is CPU-only here and used
purely as a test oracle — never on the compute path)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from robust_e_nerf_tpu.utils import transforms as tf


def test_softplus_matches_torch(rng):
    x = rng.normal(scale=5.0, size=256).astype(np.float32)
    for beta in (1.0, 100.0):
        ours = np.asarray(tf.softplus(jnp.asarray(x), beta=beta))
        expected = torch.nn.functional.softplus(
            torch.from_numpy(x), beta=beta, threshold=20.0
        ).numpy()
        np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_inv_softplus_roundtrip(rng):
    y = np.abs(rng.normal(scale=3.0, size=256)).astype(np.float32) + 1e-3
    for beta in (1.0, 100.0):
        raw = tf.inv_softplus(jnp.asarray(y), beta=beta)
        back = np.asarray(tf.softplus(raw, beta=beta))
        np.testing.assert_allclose(back, y, rtol=1e-3, atol=1e-4)


def test_scaled_shifted_sigmoid_roundtrip(rng):
    low, high = 0.0, 1.375e-6  # a realistic max refractory period (seconds)
    y = rng.uniform(low + 1e-9, high - 1e-9, size=64).astype(np.float64)
    raw = tf.inv_scaled_shifted_sigmoid(jnp.asarray(y), low, high)
    back = np.asarray(tf.scaled_shifted_sigmoid(raw, low, high))
    np.testing.assert_allclose(back, y, rtol=1e-3)  # f32 sigmoid/logit


def test_scaled_shifted_sigmoid_gradient_profile():
    """Gradient at x equals sigmoid'(x / scale) — modules.py:58-64."""
    scale = 7.0
    x = jnp.asarray(1.3)
    g = jax.grad(lambda v: tf.scaled_shifted_sigmoid(v, 0.0, scale))(x)
    s = jax.nn.sigmoid(x / scale)
    np.testing.assert_allclose(float(g), float(s * (1 - s)), rtol=1e-6)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.asarray([-1.0, 0.0, 10.0, 20.0], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tf.trunc_exp(x)), np.exp(np.asarray(x)), rtol=1e-5
    )
    grads = jax.vmap(jax.grad(tf.trunc_exp))(x)
    expected = np.exp(np.clip(np.asarray(x), None, 15.0))
    np.testing.assert_allclose(np.asarray(grads), expected, rtol=1e-5)
    # forward-mode too (the l_grad path uses jvp)
    _, t = jax.jvp(tf.trunc_exp, (jnp.asarray(20.0),), (jnp.asarray(1.0),))
    np.testing.assert_allclose(float(t), np.exp(15.0), rtol=1e-5)


def test_mape_matches_torch_semantics(rng):
    pred = rng.normal(size=128).astype(np.float32)
    target = rng.normal(size=128).astype(np.float32)
    ours = np.asarray(tf.mape_error(jnp.asarray(pred), jnp.asarray(target)))
    expected = np.abs(pred - target) / np.clip(
        np.abs(target), np.finfo(np.float64).eps, None
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_error_fn_registry(rng):
    pred = jnp.asarray(rng.normal(size=16).astype(np.float32))
    target = jnp.asarray(rng.normal(size=16).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tf.ERROR_FNS["l1"](pred, target)),
        np.abs(np.asarray(pred - target)),
    )
    np.testing.assert_allclose(
        np.asarray(tf.ERROR_FNS["mse"](pred, target)),
        np.square(np.asarray(pred - target)),
        rtol=1e-6,
    )
