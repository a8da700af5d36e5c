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

The same ray-major ordering makes the per-ray accumulation (nerfacc's
segmented `accumulate_along_rays` reduce) a *segment sum over contiguous
rows*: a blocked cumulative sum of the `[w*radiance | w | w*t_mid]` payload
plus two boundary gathers per ray, instead of a K-row scatter-add (scatters
are priced per row on TPU; the K-row payload scatter was ~15% of the
training step, docs/PERFORMANCE.md).  Precision: the block length is >= the
per-ray sample cap, so every ray spans at most two blocks — its sum
combines block-LOCAL prefix sums (error bounded by one block's magnitude)
and at most one exact block total, never differences of a global
megasample-length running sum.

Early termination (`early_stop_eps`) and the alpha threshold (`alpha_thre`)
become weight masks instead of control flow (the reference applies them as a
sample filter inside the CUDA marcher, external/utils.py:106-119); samples
they would have dropped have transmittance below eps and contribute
negligibly, so the rendered values match to ~eps.
"""

from __future__ import annotations

import jax.numpy as jnp


def _segment_sums(cols, ray_first, counts, block):
    """Per-ray sums of contiguous sample-row segments via blocked cumsums.

    `cols` is a tuple of 1-D (K,) arrays (one per accumulated quantity)
    with segment rows already zero outside their segments; ray r covers
    rows [ray_first[r], ray_first[r] + counts[r]).  Returns
    (len(ray_first), len(cols)).  Requires counts <= block (guaranteed
    upstream: counts are bounded by the per-ray lattice length, which
    `block` is chosen to cover), so each segment touches at most two
    blocks.

    The columns are deliberately kept 1-D and reshaped to
    (num_blocks, block) — block >= 1024 — for the cumsum: a 2-D (K, C)
    payload with a narrow trailing dim tile-pads 128/C x under the TPU
    (8, 128) layout (671 MB per materialization at the 2^20 budget's
    K = 1.31M; the round-3 ladder OOM was dominated by exactly such
    temps), while the (num_blocks, block) layout pads nothing.
    """
    num_rows = cols[0].shape[0]
    num_blocks = -(-num_rows // block)
    pad = num_blocks * block - num_rows
    flat_max = num_blocks * block - 1

    start = jnp.clip(ray_first, 0, num_rows)              # inclusive
    stop = jnp.clip(ray_first + counts, 0, num_rows)      # exclusive
    last = jnp.maximum(stop - 1, 0)
    b_start = start // block
    b_last = last // block
    head_valid = (start % block) > 0
    same_block = b_last == b_start
    nonempty = stop > start
    idx_head = jnp.clip(start - 1, 0, flat_max)
    idx_tail = jnp.clip(last, 0, flat_max)

    outs = []
    for col in cols:
        if pad:
            col = jnp.pad(col, (0, pad))
        within = jnp.cumsum(col.reshape(num_blocks, block), axis=1)
        block_totals = within[:, -1]            # (num_blocks,) exact sums
        within_flat = within.reshape(-1)
        # sum of the start block's rows BEFORE `start` (0 at a boundary)
        head_exc = jnp.where(head_valid, within_flat[idx_head], 0.0)
        # sum of the last block's rows THROUGH `last`
        tail_inc = within_flat[idx_tail]
        acc = jnp.where(
            same_block,
            tail_inc - head_exc,
            (block_totals[b_start] - head_exc) + tail_inc,
        )
        outs.append(jnp.where(nonempty, acc, 0.0))
    return jnp.stack(outs, axis=-1)


def distortion_sum(weights, buf, valid):
    """Sum over valid samples of the mip-NeRF 360 distortion integrand
    (eq. 15 in arXiv 2111.12077), with ray-normalized sample positions
    s_i = (t_mid_i - t_first) / (t_last - t_first):

        L_r = sum_ij w_i w_j |s_i - s_j| + (1/3) sum_i w_i^2 ds_i

    computed in O(K) via the same ray-major global-cumsum + ray-first
    offset trick as the transmittance above: with samples ascending in s,
    sum_ij w_i w_j |s_i - s_j| = 2 sum_i w_i (s_i W_<i - S_<i) where
    W_<i / S_<i are the within-ray exclusive prefixes of w and w*s.
    Returns the SUM over all rays (caller normalizes by its valid-ray
    count).  Rays with < 2 samples contribute zero (their span is
    degenerate).  This backs the opt-in `loss.weight.distortion`
    regularizer (loss_metric/loss.py) — an anti-"floater"/fog term the
    reference does not have.
    """
    num_rows = weights.shape[0]
    rf = jnp.clip(buf["ray_first"], 0, num_rows - 1)
    counts = buf["counts"]
    last = jnp.clip(buf["ray_first"] + counts - 1, 0, num_rows - 1)
    t_mid = buf["t_mid"]
    # per-ray span; rays with < 2 samples get an infinite span so both
    # their s and ds collapse to zero (no distortion defined on a point)
    span = jnp.where(
        counts > 1,
        jnp.maximum(t_mid[last] - t_mid[rf], 1e-12),
        jnp.inf,
    )
    ray_idx = buf["ray_idx"]
    s = (t_mid - t_mid[rf][ray_idx]) / span[ray_idx]
    ds = buf["delta"] / span[ray_idx]
    ws = weights * s
    ew = jnp.cumsum(weights) - weights       # global exclusive prefix
    ews = jnp.cumsum(ws) - ws
    w_pref = ew - ew[rf][ray_idx]            # within-ray exclusive sum(w)
    ws_pref = ews - ews[rf][ray_idx]         # within-ray exclusive sum(w*s)
    per_sample = (
        2.0 * weights * (s * w_pref - ws_pref)
        + (weights * weights) * ds / 3.0
    )
    return jnp.sum(jnp.where(valid, per_sample, 0.0))


def segment_block_size(max_samples_per_ray):
    """Block length for `_segment_sums`: covers the per-ray sample cap so
    every ray spans at most two blocks."""
    return max(1024, 1 << (max_samples_per_ray - 1).bit_length())


def alpha_transmittance(sigma, buf):
    """(alpha, trans) over the compacted ray-major sample buffer — the
    exclusive per-ray transmittance via one global cumsum + a ray-first
    offset gather (module docstring).  Shared by the compositor and the
    visibility compaction (models/nerf.py:_compact_visible) so the
    predicate semantics cannot drift apart."""
    sigma = sigma.reshape(-1)
    valid = buf["valid"]
    sigma_dt = sigma * buf["delta"] * valid.astype(sigma.dtype)
    alpha = 1.0 - jnp.exp(-sigma_dt)
    csum = jnp.cumsum(sigma_dt)
    ecs = csum - sigma_dt
    ray_first = jnp.clip(buf["ray_first"], 0, sigma.shape[0] - 1)
    offsets = ecs[ray_first][buf["ray_idx"]]
    trans = jnp.exp(-(ecs - offsets))
    return alpha, trans


def visibility_mask(alpha, trans, valid, early_stop_eps, alpha_thre):
    """The reference marcher's sample filter (nerfacc render_visibility,
    external/utils.py:107-130): keep samples whose accumulated
    transmittance is above eps (and alpha above the threshold, if set)."""
    mask = valid & (trans > early_stop_eps)
    if alpha_thre > 0.0:
        mask = mask & (alpha >= alpha_thre)
    return mask


def composite(
    sigma,            # (K,) or (K, 1) densities
    radiance,         # (K, C) post-activation radiance
    buf,              # sample buffer from ray_march.march_and_compact
    num_rays,         # static B
    render_bkgd=None,  # (C,) background radiance or None
    early_stop_eps=1e-4,
    alpha_thre=0.0,
    max_samples_per_ray=1024,  # bounds a ray's buffer-segment length
    accumulate="cumsum",       # "cumsum" | "scatter" (A/B oracle path)
    compute_distortion=False,  # append distortion_sum to the outputs
):
    """Returns (colors (B, C), opacities (B,), depths (B,), n_visible ())
    plus, when `compute_distortion`, the scalar `distortion_sum`."""
    import os

    accumulate = os.environ.get("REN_COMPOSITE", accumulate)
    sigma = sigma.reshape(-1)
    valid = buf["valid"]
    if alpha_thre > 0.0:
        # sub-threshold alphas are zeroed BEFORE the transmittance scan
        # (the reference's alpha_thre filter removes them from rendering)
        sigma_dt0 = sigma * buf["delta"] * valid.astype(sigma.dtype)
        keep = (1.0 - jnp.exp(-sigma_dt0)) >= alpha_thre
        sigma = jnp.where(keep, sigma, 0.0)
    alpha, trans = alpha_transmittance(sigma, buf)

    visible = valid & (trans > early_stop_eps) & (alpha > 0.0)
    weights = jnp.where(visible, alpha * trans, 0.0)

    # The C + 2 accumulated quantities — per-channel w*radiance, w, and
    # w*t_mid — share their segment boundaries and are carried as 1-D (K,)
    # columns (never a (K, C+2) payload: narrow 2-D K-row arrays tile-pad
    # 128/C x, see _segment_sums).  The accumulation dtype is pinned to
    # the weights' (f32) so a lower-precision radiance (e.g. bf16 field
    # output) never silently demotes the accumulators.
    n_chan = radiance.shape[-1]
    acc_dtype = weights.dtype
    cols = tuple(
        weights * radiance[:, c].astype(acc_dtype) for c in range(n_chan)
    ) + (weights, weights * buf["t_mid"])
    if accumulate == "cumsum":
        # contiguous-segment sums: blocked cumsum + 2 boundary gathers per
        # ray (see module docstring); block covers the per-ray sample cap
        block = segment_block_size(max_samples_per_ray)
        acc = _segment_sums(
            cols, buf["ray_first"], buf["counts"], block
        )
        if acc.shape[0] != num_rays:  # ray_first/counts padded past B
            acc = acc[:num_rays]
    else:
        assert accumulate == "scatter"
        payload = jnp.stack(cols, axis=-1)
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
    if compute_distortion:
        dist = distortion_sum(weights, buf, valid)
        return colors, opacities, depths, n_visible, dist
    return colors, opacities, depths, n_visible
