"""SH / sinusoidal encoders vs independent oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from robust_e_nerf_tpu.models import encoders


def real_sh_scipy(degree, coords):
    """Real spherical harmonics from scipy's complex ones, in the tcnn
    channel order (l asc, m from -l..l) and Cartesian convention.

    tcnn's basis uses plain Cartesian polynomials; relative to the standard
    real SH (theta from +z, phi from +x toward +y) the odd-m channels carry
    a (-1)^m Condon-Shortley factor already folded into the coefficients.
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)
    out = []
    for ell in range(degree):
        for m in range(-ell, ell + 1):
            ylm = sph_harm_y(ell, abs(m), theta, phi)
            if m < 0:
                val = np.sqrt(2) * (-1) ** m * ylm.imag
            elif m == 0:
                val = ylm.real
            else:
                val = np.sqrt(2) * (-1) ** m * ylm.real
            out.append(val)
    return np.stack(out, axis=-1)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_sh_matches_scipy_up_to_channel_signs(rng, degree):
    """Each channel must equal the scipy real SH up to the fixed tcnn sign
    convention (a per-channel constant +-1)."""
    dirs = rng.normal(size=(512, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = np.asarray(encoders.sh_encode(jnp.asarray(dirs), degree))
    expected = real_sh_scipy(degree, dirs)
    assert ours.shape == (512, degree**2)
    for ch in range(degree**2):
        ratio_pos = np.max(np.abs(ours[:, ch] - expected[:, ch]))
        ratio_neg = np.max(np.abs(ours[:, ch] + expected[:, ch]))
        assert min(ratio_pos, ratio_neg) < 1e-5, (
            f"channel {ch} differs from real SH beyond sign"
        )


def test_sh_degree4_spot_values():
    """Hand-computed spot checks of the exact tcnn coefficients the
    reference hard-codes (external/sh_encoder.py:55-78)."""
    d = np.array([[0.0, 0.0, 1.0]])
    out = np.asarray(encoders.sh_encode(jnp.asarray(d), 4))[0]
    np.testing.assert_allclose(out[0], 0.28209479177387814)
    np.testing.assert_allclose(out[2], 0.48860251190291987)
    np.testing.assert_allclose(out[6], 0.94617469575755997
                               - 0.31539156525251999)
    np.testing.assert_allclose(out[12], 0.3731763325901154 * 2.0)
    assert abs(out[1]) < 1e-12 and abs(out[3]) < 1e-12


def test_sinusoidal_encoder_matches_reference_math(rng):
    """external/mlp.py:227-243: [x | sin(x*2^k) | cos(x*2^k)] layout."""
    x = rng.normal(size=(32, 3)).astype(np.float32)
    min_deg, max_deg = 0, 4
    ours = np.asarray(
        encoders.sinusoidal_encode(jnp.asarray(x), min_deg, max_deg)
    )
    scales = np.array([2.0**i for i in range(min_deg, max_deg)])
    xb = (x[:, None, :] * scales[:, None]).reshape(32, -1)
    expected = np.concatenate(
        [x, np.sin(xb), np.sin(xb + 0.5 * np.pi)], axis=-1
    )
    np.testing.assert_allclose(ours, expected, atol=1e-6)
    assert ours.shape[-1] == encoders.sinusoidal_output_dim(3, min_deg,
                                                            max_deg)
