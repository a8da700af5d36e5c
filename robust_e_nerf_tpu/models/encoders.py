"""Direction / position encoders.

* `sh_encode` — real spherical harmonics of unit direction vectors up to
  degree 8, numerically identical to tiny-cuda-nn's SphericalHarmonics (the
  reference swaps tcnn's CUDA dir-encoding for a pure-torch version with the
  same hard-coded coefficients, `external/sh_encoder.py`; the coefficient
  table is the standard real-SH basis).
* `sinusoidal_encode` — classic NeRF positional encoding
  (`external/mlp.py:208-243`), used by the vanilla-MLP architecture.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(coords, degree):
    """Real spherical harmonics of (..., 3) unit vectors -> (..., degree**2).

    Channel ordering and signs follow the tcnn convention used by the
    reference (external/sh_encoder.py:55-191).
    """
    assert 1 <= degree <= 8
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
    x6, y6, z6 = x4 * x2, y4 * y2, z4 * z2
    one = jnp.ones_like(x)

    ch = [0.28209479177387814 * one]
    if degree > 1:
        ch += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        ch += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree > 3:
        ch += [
            0.59004358992664352 * y * (y2 - 3.0 * x2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (3.0 * y2 - x2),
        ]
    if degree > 4:
        ch += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (y2 - 3.0 * x2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            3.7024941420321507 * z4 - 3.1735664074561294 * z2
            + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (3.0 * y2 - x2),
            0.62583573544917614 * (x4 + y4) - 3.7550144126950569 * x2 * y2,
        ]
    if degree > 5:
        ch += [
            0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            8.3026492595241645 * xy * z * (x2 - y2),
            -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
            4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
            0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
            0.1169503224534236 * z * (63.0 * z4 - 70.0 * z2 + 15.0),
            0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
            2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
            -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
            2.0756623148810411 * z * (x4 + y4 - 6.0 * x2 * y2),
            0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
        ]
    if degree > 6:
        ch += [
            1.3663682103838286 * xy * (3.0 * x4 + 3.0 * y4
                                       - 10.0 * x2 * y2),
            2.3666191622317521 * yz * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            2.0182596029148963 * xy * (x2 - y2) * (11.0 * z2 - 1.0),
            -0.92120525951492349 * yz * (3.0 * x2 - y2) * (11.0 * z2 - 3.0),
            0.92120525951492349 * xy * (33.0 * z4 - 18.0 * z2 + 1.0),
            0.58262136251873131 * yz * (30.0 * z2 - 33.0 * z4 - 5.0),
            14.684485723822165 * z6 - 20.024298714302954 * z4
            + 6.6747662381009842 * z2 - 0.31784601133814211,
            0.58262136251873131 * xz * (30.0 * z2 - 33.0 * z4 - 5.0),
            0.46060262975746175 * (x2 - y2)
            * (11.0 * z2 * (3.0 * z2 - 1.0) - 7.0 * z2 + 1.0),
            -0.92120525951492349 * xz * (x2 - 3.0 * y2) * (11.0 * z2 - 3.0),
            0.50456490072872406 * (11.0 * z2 - 1.0)
            * (x4 + y4 - 6.0 * x2 * y2),
            2.3666191622317521 * xz * (10.0 * x2 * y2 - x4 - 5.0 * y4),
            10.247761577878714 * (x2 * y4 - x4 * y2)
            + 0.6831841051919143 * (x6 - y6),
        ]
    if degree > 7:
        ch += [
            0.70716273252459627 * y
            * (35.0 * x4 * y2 - 21.0 * x2 * y4 - 7.0 * x6 + y6),
            5.2919213236038001 * xy * z
            * (3.0 * x4 + 3.0 * y4 - 10.0 * x2 * y2),
            -0.51891557872026028 * y * (13.0 * z2 - 1.0)
            * (5.0 * x4 + y4 - 10.0 * x2 * y2),
            4.1513246297620823 * xy * z * (x2 - y2) * (13.0 * z2 - 3.0),
            -0.15645893386229404 * y * (3.0 * x2 - y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            0.44253269244498261 * xy * z
            * (143.0 * z4 - 110.0 * z2 + 15.0),
            0.090331607582517306 * y
            * (495.0 * z4 - 135.0 * z2 - 429.0 * z6 + 5.0),
            0.068284276912004949 * z
            * (315.0 * z2 - 693.0 * z4 + 429.0 * z6 - 35.0),
            0.090331607582517306 * x
            * (495.0 * z4 - 135.0 * z2 - 429.0 * z6 + 5.0),
            0.07375544874083044 * z * (x2 - y2)
            * (143.0 * z2 * (3.0 * z2 - 1.0) - 187.0 * z2 + 45.0),
            -0.15645893386229404 * x * (x2 - 3.0 * y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            1.0378311574405206 * z * (13.0 * z2 - 3.0)
            * (x4 + y4 - 6.0 * x2 * y2),
            -0.51891557872026028 * x * (13.0 * z2 - 1.0)
            * (x4 + 5.0 * y4 - 10.0 * x2 * y2),
            2.6459606618019 * z
            * (15.0 * x2 * y4 - 15.0 * x4 * y2 + x6 - y6),
            0.70716273252459627 * x
            * (21.0 * x4 * y2 - 35.0 * x2 * y4 - x6 + 7.0 * y6),
        ]
    return jnp.stack(ch, axis=-1)


def sh_output_dim(degree):
    return degree * degree


def sinusoidal_encode(x, min_deg, max_deg, use_identity=True):
    """NeRF sinusoidal positional encoding (external/mlp.py:208-243).

    x: (..., D); output (..., (use_identity + 2*(max_deg-min_deg)) * D)
    ordered as [identity | sin(x*2^k) blocks | cos(x*2^k) blocks].
    """
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)],
                         dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        (*x.shape[:-1], (max_deg - min_deg) * x.shape[-1])
    )
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def sinusoidal_output_dim(x_dim, min_deg, max_deg, use_identity=True):
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim
