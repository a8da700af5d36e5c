"""Optimizer assembly: the reference's 4-group Adam + MultiStepLR.

Counterpart of `RobustENeRF.configure_optimizers` (robust_e_nerf.py:782-832):

  group                     lr                              extras
  contrast_threshold        optimizer.lr.contrast_threshold
  refractory_period         max_tau * relative_lr.refractory_period
  nerf_mlp (params under    optimizer.lr.default            L2 weight decay
    "nerf.radiance_field.mlp*" — which in the reference includes the tcnn
    hash table inside mlp_base, so the hash table is decayed here too)
  other (background, ...)   optimizer.lr.default

torch.optim.Adam applies weight decay as grad += wd * p *before* the moment
updates, so the optax chain adds decayed weights before scale_by_adam.
MultiStepLR (interval "epoch") becomes a step->factor schedule with
epoch = step // steps_per_epoch.

Frozen components (robust_e_nerf.py:288-292) get `optax.set_to_zero`.
"""

from __future__ import annotations

import optax

from ..utils import pytree

GROUP_FROZEN = "frozen"
GROUP_CT = "contrast_threshold"
GROUP_TAU = "refractory_period"
GROUP_NERF_MLP = "nerf_mlp"
GROUP_OTHER = "other"

# parameter sub-trees matching the reference's
# "nerf.radiance_field.mlp" prefix (robust_e_nerf.py:786-789): for NGP this
# is mlp_base — whose first child is the tcnn hash encoding — plus mlp_head;
# for the vanilla arch it is the whole NerfMLP.
_NERF_MLP_SUBTREES = (
    "hash", "mlp_base", "mlp_head",            # ngp
    "vm",                                       # tensorf (TPU fast path)
    "trunk", "sigma_layer", "bottleneck", "rgb_layer",  # vanilla
)


def label_params(params, freeze_flags):
    """Map each leaf path to its optimizer group.

    freeze_flags: {"contrast_threshold": bool, "refractory_period": bool,
    "nerf": bool}."""

    def label_fn(path_key):
        component = path_key.split("/", 1)[0]
        if component == "contrast_threshold":
            return GROUP_FROZEN if freeze_flags[component] else GROUP_CT
        if component == "refractory_period":
            return GROUP_FROZEN if freeze_flags[component] else GROUP_TAU
        assert component == "nerf"
        if freeze_flags["nerf"]:
            return GROUP_FROZEN
        parts = path_key.split("/")
        if len(parts) >= 3 and parts[1] == "radiance_field" and (
            parts[2] in _NERF_MLP_SUBTREES
        ):
            return GROUP_NERF_MLP
        return GROUP_OTHER

    return pytree.component_labels(params, label_fn)


def multi_step_lr_factor(milestones, gamma, steps_per_epoch):
    """MultiStepLR factor as a function of the global step."""
    milestones = sorted(int(m) for m in milestones)

    def factor(step):
        epoch = step // steps_per_epoch
        f = 1.0
        for m in milestones:
            f = f * (gamma ** (epoch >= m))
        return f

    return factor


def _adam_group(base_lr, factor_fn, weight_decay=0.0):
    parts = []
    if weight_decay > 0.0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(
        optax.scale_by_schedule(lambda step: -base_lr * factor_fn(step))
    )
    return optax.chain(*parts)


def build_optimizer(config, params, max_refractory_period_s,
                    steps_per_epoch):
    """The 4-group optimizer (robust_e_nerf.py:799-832).

    Returns (optax transformation, labels pytree)."""
    opt_cfg = config["optimizer"]
    assert opt_cfg["algo"] == "adam", opt_cfg["algo"]
    sched_cfg = config["lr_scheduler"]
    assert sched_cfg["algo"] == "multi_step_lr", sched_cfg["algo"]
    if sched_cfg["interval"] == "epoch":
        sched_steps = steps_per_epoch
    else:  # "step"
        sched_steps = 1
    factor_fn = multi_step_lr_factor(
        sched_cfg["multi_step_lr"]["milestones"],
        float(sched_cfg["multi_step_lr"]["gamma"]),
        sched_steps,
    )

    default_lr = float(opt_cfg["lr"]["default"])
    ct_lr = float(opt_cfg["lr"]["contrast_threshold"])
    tau_lr = (
        max_refractory_period_s
        * float(opt_cfg["relative_lr"]["refractory_period"])
    )
    weight_decay = float(
        config["loss"]["weight"]["nerf_mlp_weight_decay"]
    )

    freeze_flags = {
        name: bool(config["model"][name]["freeze"])
        for name in ("contrast_threshold", "refractory_period", "nerf")
    }
    labels = label_params(params, freeze_flags)

    optimizer = optax.multi_transform(
        {
            GROUP_FROZEN: optax.set_to_zero(),
            GROUP_CT: _adam_group(ct_lr, factor_fn),
            GROUP_TAU: _adam_group(tau_lr, factor_fn),
            GROUP_NERF_MLP: _adam_group(default_lr, factor_fn,
                                        weight_decay),
            GROUP_OTHER: _adam_group(default_lr, factor_fn),
        },
        labels,
    )
    return optimizer, labels
