"""Volumetric compositing over the compacted sample buffer.

TPU-native replacement for nerfacc's `render_weight_from_density` (exclusive
transmittance scan) and `accumulate_along_rays` (segmented reduce), used at
external/vol_rendering.py:89-126.

Because the compacted buffer is ray-major and in marching order, the
per-ray exclusive transmittance scan is a single global cumulative sum plus
a per-ray offset gather:

    ecs[i]   = cumsum(sigma * delta)[i] - (sigma * delta)[i]
    T[i]     = exp(-(ecs[i] - ecs[ray_first[ray_idx[i]]]))
    w[i]     = (1 - exp(-sigma[i] * delta[i])) * T[i]

Early termination (`early_stop_eps`) and the alpha threshold (`alpha_thre`)
become weight masks instead of control flow (the reference applies them as a
sample filter inside the CUDA marcher, external/utils.py:106-119); samples
they would have dropped have transmittance below eps and contribute
negligibly, so the rendered values match to ~eps.
"""

from __future__ import annotations

import jax.numpy as jnp


def composite(
    sigma,            # (K,) or (K, 1) densities
    radiance,         # (K, C) post-activation radiance
    buf,              # sample buffer from ray_march.march_and_compact
    num_rays,         # static B
    render_bkgd=None,  # (C,) background radiance or None
    early_stop_eps=1e-4,
    alpha_thre=0.0,
):
    """Returns (colors (B, C), opacities (B,), depths (B,), n_visible ())."""
    sigma = sigma.reshape(-1)
    valid = buf["valid"]
    sigma_dt = sigma * buf["delta"] * valid.astype(sigma.dtype)
    alpha = 1.0 - jnp.exp(-sigma_dt)

    if alpha_thre > 0.0:
        keep = alpha >= alpha_thre
        sigma_dt = jnp.where(keep, sigma_dt, 0.0)
        alpha = jnp.where(keep, alpha, 0.0)

    csum = jnp.cumsum(sigma_dt)
    ecs = csum - sigma_dt
    ray_first = jnp.clip(buf["ray_first"], 0, sigma.shape[0] - 1)
    offsets = ecs[ray_first][buf["ray_idx"]]
    trans = jnp.exp(-(ecs - offsets))

    visible = valid & (trans > early_stop_eps) & (alpha > 0.0)
    weights = jnp.where(visible, alpha * trans, 0.0)

    # ONE K-row scatter-add for all three accumulations: scatters are
    # priced per row regardless of width (docs/PERFORMANCE.md), and the
    # three accumulators share their ray indices, so packing
    # [w * radiance | w | w * t_mid] into a (K, C + 2) payload cuts the
    # compositor's scatter rows 3x per render
    n_chan = radiance.shape[-1]
    payload = jnp.concatenate(
        [
            weights[:, None] * radiance,
            weights[:, None],
            (weights * buf["t_mid"])[:, None],
        ],
        axis=-1,
    )
    acc = jnp.zeros((num_rays, n_chan + 2), payload.dtype).at[
        buf["ray_idx"]
    ].add(payload)
    colors = acc[:, :n_chan]
    opacities = acc[:, n_chan]
    depths = acc[:, n_chan + 1]

    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities[:, None])

    # the reference counts samples surviving the marcher's early-stop/alpha
    # filter (external/utils.py:129) — that count drives the dynamic
    # batch-size controller
    n_visible = jnp.sum(
        valid & (trans > early_stop_eps)
        & ((alpha >= alpha_thre) if alpha_thre > 0.0 else True),
        dtype=jnp.int32,
    )
    return colors, opacities, depths, n_visible
