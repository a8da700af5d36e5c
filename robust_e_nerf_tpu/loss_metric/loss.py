"""Training losses (device side, pure functions).

Counterpart of `loss_metric/loss.py` (class Loss):

  target event gradient = log_intensity_diff / (end_ts - start_ts)   (:39-42)
  l_grad = mean over valid rays of err(d logI / dt, target grad)     (:54-62)
  l_diff = mean over valid rays of err(logI(end) - logI(start),
                                        ts_diff * target grad)       (:64-74)

Validity masks combine the reference's per-ray `is_valid` (opacity > 0 when
no background parameter, robust_e_nerf.py:868-871) with the fixed-capacity
batch mask (padded rays never contribute).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..utils import transforms

LOSS_NAMES = ("log_intensity_grad", "log_intensity_diff")
PARAM_WEIGHT_CHOICES = (
    None, "mean_contrast_reciprocal", "mean_contrast_reciprocal_sq"
)


@dataclasses.dataclass(frozen=True)
class LossSpec:
    weight_grad: float
    weight_diff: float
    error_fn_grad: str  # l1 | mse | mape
    error_fn_diff: str
    param_weight_grad: Optional[str]
    param_weight_diff: Optional[str]
    # OPT-IN framework extension beyond the reference (default 0 = exact
    # reference loss): Cauchy density-sparsity regularization
    # lambda * mean(log(1 + 2 sigma^2)) over marched samples.  The standard
    # empty-space stabilizer (TensoRF eq. 12 / SNeRG); its gradient
    # 4 sigma / (1 + 2 sigma^2) peaks at fog-level densities (~0.7) and
    # fades at legitimate surface densities (100+), which breaks the NGP
    # fog-densification race documented in docs/ROADMAP.md without
    # measurably penalizing the converged surface.
    weight_density_sparsity: float = 0.0
    # OPT-IN framework extension (default 0 = exact reference loss):
    # mip-NeRF 360 distortion regularization (arXiv 2111.12077 eq. 15),
    # lambda * mean over valid rays of
    #   sum_ij w_i w_j |s_i - s_j| + (1/3) sum_i w_i^2 ds_i
    # with ray-normalized sample positions s (ops/composite.py:
    # distortion_sum).  Unlike the isotropic Cauchy sparsity above, this
    # penalizes exactly the fog-race signature — rendering weight smeared
    # along supervised rays — while a converged delta-like surface has
    # near-zero distortion, so it opposes fog without opposing the fit.
    weight_distortion: float = 0.0
    # Optional schedule applied to BOTH opt-in regularizer weights
    # (docs/ROADMAP.md round-3
    # item 1: strong while the surface forms, decayed/gated afterwards so
    # the asymptotic loss approaches the exact reference loss):
    #   mode "exp": lambda(step) =
    #       max(w * rate^(max(step - hold_steps, 0) / steps), floor)
    #     — full strength for the first `hold_steps` (the surface-formation
    #     window where the fog race lives), exponential decay after
    #   mode "occ": lambda = w * clip((occ_frac - lo) / (hi - lo), 0, 1)
    #     — a feedback gate on the occupancy grid's occupied fraction: the
    #     fog race announces itself as a fattening grid (ROADMAP round-2
    #     findings), so sparsity only engages when the grid grows past
    #     `lo` and reaches full strength at `hi`.
    sparsity_schedule_mode: Optional[str] = None  # None | "exp" | "occ"
    sparsity_hold_steps: float = 0.0
    sparsity_decay_steps: float = 2000.0
    sparsity_decay_rate: float = 0.1
    sparsity_floor: float = 0.0
    sparsity_occ_frac_lo: float = 0.02
    sparsity_occ_frac_hi: float = 0.10

    def __post_init__(self):
        assert self.weight_grad >= 0 and self.weight_diff >= 0
        assert self.weight_grad + self.weight_diff > 0
        assert self.error_fn_grad in transforms.ERROR_FNS
        assert self.error_fn_diff in transforms.ERROR_FNS
        assert self.param_weight_grad in PARAM_WEIGHT_CHOICES
        assert self.param_weight_diff in PARAM_WEIGHT_CHOICES
        assert self.weight_density_sparsity >= 0
        assert self.weight_distortion >= 0
        assert self.sparsity_schedule_mode in (None, "exp", "occ")
        assert self.sparsity_decay_steps > 0
        assert self.sparsity_occ_frac_hi > self.sparsity_occ_frac_lo


def build_loss_spec(loss_config) -> LossSpec:
    schedule = dict(loss_config.get("density_sparsity_schedule") or {})
    return LossSpec(
        weight_grad=float(loss_config["weight"]["log_intensity_grad"]),
        weight_diff=float(loss_config["weight"]["log_intensity_diff"]),
        error_fn_grad=loss_config["error_fn"]["log_intensity_grad"],
        error_fn_diff=loss_config["error_fn"]["log_intensity_diff"],
        param_weight_grad=loss_config["param_weight"]["log_intensity_grad"],
        param_weight_diff=loss_config["param_weight"]["log_intensity_diff"],
        weight_density_sparsity=float(
            loss_config["weight"].get("density_sparsity") or 0.0
        ),
        weight_distortion=float(
            loss_config["weight"].get("distortion") or 0.0
        ),
        sparsity_schedule_mode=schedule.get("mode"),
        sparsity_hold_steps=_float_default(schedule, "hold_steps", 0.0),
        sparsity_decay_steps=_float_default(schedule, "decay_steps",
                                            2000.0),
        sparsity_decay_rate=_float_default(schedule, "decay_rate", 0.1),
        sparsity_floor=_float_default(schedule, "floor", 0.0),
        sparsity_occ_frac_lo=_float_default(schedule, "occ_frac_lo", 0.02),
        sparsity_occ_frac_hi=_float_default(schedule, "occ_frac_hi", 0.10),
    )


def _float_default(mapping, key, default):
    """`mapping.get(key)` with a default applied only when the key is
    absent/None — an explicitly configured 0 stays 0 (an `or`-default
    would silently replace it)."""
    value = mapping.get(key)
    return float(default if value is None else value)


def _scheduled_weight(spec: LossSpec, base, step, occ_frac):
    """Apply the (shared) regularizer schedule to a base weight."""
    mode = spec.sparsity_schedule_mode
    if mode is None:
        return base
    if mode == "exp":
        decay_pos = jnp.maximum(
            step.astype(jnp.float32) - spec.sparsity_hold_steps, 0.0
        )
        lam = base * spec.sparsity_decay_rate ** (
            decay_pos / spec.sparsity_decay_steps
        )
        return jnp.maximum(lam, spec.sparsity_floor)
    lo, hi = spec.sparsity_occ_frac_lo, spec.sparsity_occ_frac_hi
    gate = jnp.clip((occ_frac - lo) / (hi - lo), 0.0, 1.0)
    return base * gate


def density_sparsity_weight(spec: LossSpec, step, occ_frac):
    """Effective density-sparsity weight lambda for this step (device
    scalar).  `step` is the optimizer step, `occ_frac` the occupancy
    grid's occupied fraction."""
    return _scheduled_weight(
        spec, spec.weight_density_sparsity, step, occ_frac
    )


def distortion_weight(spec: LossSpec, step, occ_frac):
    """Effective distortion weight lambda for this step (device scalar);
    shares the sparsity schedule — both are surface-formation stabilizers
    with the same lifecycle."""
    return _scheduled_weight(spec, spec.weight_distortion, step, occ_frac)


def masked_mean(values, mask, axis_name=None):
    """Mean over valid entries; with `axis_name`, numerator and denominator
    are `psum`-reduced so the mean is global across the device mesh."""
    mask = mask.astype(values.dtype)
    num = jnp.sum(jnp.where(mask > 0, values, 0.0))
    den = jnp.sum(mask)
    if axis_name is not None:
        import jax

        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def log_intensity_grad_loss(spec: LossSpec, pred_grad, target_grad,
                            is_valid, axis_name=None):
    err = transforms.ERROR_FNS[spec.error_fn_grad](pred_grad, target_grad)
    return masked_mean(err, is_valid, axis_name)


def log_intensity_diff_loss(spec: LossSpec, pred_diff, ts_diff, target_grad,
                            is_valid, axis_name=None):
    err = transforms.ERROR_FNS[spec.error_fn_diff](
        pred_diff, ts_diff * target_grad
    )
    return masked_mean(err, is_valid, axis_name)


def param_weight_value(name, mean_contrast_threshold):
    """Loss normalization by the mean contrast threshold
    (robust_e_nerf.py:470-479)."""
    if name is None:
        return 1.0
    recip = 1.0 / mean_contrast_threshold
    if name == "mean_contrast_reciprocal":
        return recip
    return recip**2
