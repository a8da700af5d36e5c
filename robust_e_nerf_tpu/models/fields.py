"""Radiance fields: Instant-NGP (hash grid + small MLPs) and vanilla NeRF MLP.

Re-designs of the reference's `external/ngp.py` (NGPradianceField) and
`external/mlp.py` (VanillaNeRFRadianceField) as pure init/apply functions
over parameter pytrees.  Weight layout is (fan_in, fan_out) so the forward
pass is `x @ w + b` — a clean MXU matmul.  Initialization matches torch's
`nn.Linear` default (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias), which is what the reference uses for all field MLPs
(external/mlp.py:26-97 with init fns set to None in external/ngp.py:171-205).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import hash_grid, vm_grid
from ..utils import transforms
from . import contraction, encoders


# ----------------------------------------------------------------------------
# plain MLP
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLPSpec:
    input_dim: int
    output_dim: int
    net_depth: int
    net_width: int
    skip_layer: Optional[int] = None
    hidden_activation: str = "relu"
    output_activation: Optional[str] = None  # None = identity
    output_enabled: bool = True
    weight_norm: bool = False

    @property
    def final_dim(self):
        if self.output_enabled:
            return self.output_dim
        return self._trunk_dims()[-1][1]

    def _trunk_dims(self):
        """[(in, out)] for each hidden layer, honouring skip connections
        (external/mlp.py:56-69: concat happens after layers i with
        i % skip == 0 and i > 0)."""
        dims = []
        in_features = self.input_dim
        for i in range(self.net_depth):
            dims.append((in_features, self.net_width))
            if (
                self.skip_layer is not None
                and i % self.skip_layer == 0
                and i > 0
            ):
                in_features = self.net_width + self.input_dim
            else:
                in_features = self.net_width
        if not dims:
            dims.append((self.input_dim, self.input_dim))  # placeholder
        return dims


_ACTIVATIONS = dict(transforms.HIDDEN_ACTIVATIONS)
_ACTIVATIONS.update(
    sigmoid=jax.nn.sigmoid,
    softplus1=lambda x: transforms.softplus(x, beta=1.0),
)


def _activation(name):
    if name is None:
        return lambda x: x
    if name == "softplus_out":  # radiance softplus has beta=1 (nerf.py:26-29)
        return lambda x: transforms.softplus(x, beta=1.0)
    return _ACTIVATIONS[name]


def _init_linear(key, fan_in, fan_out, weight_norm, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    w = jax.random.uniform(
        wkey, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype
    )
    b = jax.random.uniform(
        bkey, (fan_out,), minval=-bound, maxval=bound, dtype=dtype
    )
    if weight_norm:
        # torch weight_norm(dim=0): w_ij = g_j * v_ij / ||v_:,j||
        g = jnp.linalg.norm(w, axis=0)
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def _linear(params, x):
    if "v" in params:
        v = params["v"]
        w = params["g"] * v / jnp.linalg.norm(v, axis=0, keepdims=True)
    else:
        w = params["w"]
    return x @ w + params["b"]


def init_mlp(key, spec: MLPSpec):
    layers = []
    keys = jax.random.split(key, spec.net_depth + 1)
    in_features = spec.input_dim
    for i in range(spec.net_depth):
        layers.append(
            _init_linear(keys[i], in_features, spec.net_width,
                         spec.weight_norm)
        )
        if (
            spec.skip_layer is not None
            and i % spec.skip_layer == 0
            and i > 0
        ):
            in_features = spec.net_width + spec.input_dim
        else:
            in_features = spec.net_width
    params = {"hidden": layers}
    if spec.output_enabled:
        params["output"] = _init_linear(
            keys[-1], in_features, spec.output_dim, spec.weight_norm
        )
    return params


def apply_mlp(params, x, spec: MLPSpec):
    inputs = x
    act = _activation(spec.hidden_activation)
    for i, layer in enumerate(params["hidden"]):
        x = act(_linear(layer, x))
        if (
            spec.skip_layer is not None
            and i % spec.skip_layer == 0
            and i > 0
        ):
            x = jnp.concatenate([x, inputs], axis=-1)
    if spec.output_enabled:
        x = _linear(params["output"], x)
        x = _activation(spec.output_activation)(x)
    return x


# ----------------------------------------------------------------------------
# Instant-NGP radiance field (external/ngp.py:109-280)
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NGPFieldSpec:
    hash_meta: hash_grid.HashGridMeta
    sh_degree: int
    mlp_base: MLPSpec
    mlp_head: MLPSpec
    geo_feat_dim: int
    density_activation: str
    contraction_type: str
    radiance_dim: int
    num_dim: int = 3
    use_viewdirs: bool = True
    remat: bool = False  # rematerialize field eval in the backward (memory)


def build_ngp_spec(arch_config, contraction_type, radiance_dim, num_dim=3):
    """Derive the static spec from the `nerf.ngp` config block
    (configs/train/synthetic.yaml:61-84, external/ngp.py:112-205)."""
    meta = hash_grid.build_meta(arch_config["pos_encoding"], num_dim)
    sh_degree = int(arch_config["dir_encoding"]["degree"])
    base_cfg = arch_config["mlp_base"]
    head_cfg = arch_config["mlp_head"]
    geo_feat_dim = int(base_cfg["geo_feat_dim"])
    mlp_base = MLPSpec(
        input_dim=meta.output_dim,
        output_dim=1 + geo_feat_dim,
        net_depth=int(base_cfg["n_hidden_layers"]),
        net_width=int(base_cfg["n_neurons"]),
        skip_layer=None,
        hidden_activation=base_cfg["hidden_activation"],
        output_activation=None,
        weight_norm=bool(base_cfg["weight_norm"]),
    )
    mlp_head = MLPSpec(
        input_dim=encoders.sh_output_dim(sh_degree) + geo_feat_dim,
        output_dim=radiance_dim,
        net_depth=int(head_cfg["n_hidden_layers"]),
        net_width=int(head_cfg["n_neurons"]),
        skip_layer=None,
        hidden_activation=head_cfg["hidden_activation"],
        output_activation={
            "softplus": "softplus_out", "sigmoid": "sigmoid"
        }[head_cfg["radiance_activation"]],
        weight_norm=bool(head_cfg["weight_norm"]),
    )
    return NGPFieldSpec(
        hash_meta=meta,
        sh_degree=sh_degree,
        mlp_base=mlp_base,
        mlp_head=mlp_head,
        geo_feat_dim=geo_feat_dim,
        density_activation=base_cfg["density_activation"],
        contraction_type=contraction_type,
        radiance_dim=radiance_dim,
        num_dim=num_dim,
        # The per-level jax.checkpoint inside ops/hash_grid.encode already
        # bounds backward residuals to one level's working set, so the
        # outer field-level remat is redundant for ngp — and costly: with
        # it on, every level's corner gathers run 3x per render (forward,
        # outer-remat recompute, inner-checkpoint recompute).  Default off
        # since round 3; `nerf.ngp.remat: true` restores it for
        # memory-constrained runs.
        remat=bool(arch_config.get("remat", False)),
    )


def init_ngp(key, spec: NGPFieldSpec):
    k_table, k_base, k_head = jax.random.split(key, 3)
    return {
        "hash": {"table": hash_grid.init_table(k_table, spec.hash_meta)},
        "mlp_base": init_mlp(k_base, spec.mlp_base),
        "mlp_head": init_mlp(k_head, spec.mlp_head),
    }


def _contract_with_selector(x, aabb, contraction_type, num_dim):
    c = contraction.contract(x, aabb, contraction_type, num_dim)
    selector = jnp.all((c > 0.0) & (c < 1.0), axis=-1)
    return c, selector


def ngp_query_density(params, x, aabb, spec: NGPFieldSpec,
                      return_feat=False):
    """Density (and geometric features) at world positions x (..., 3)
    (external/ngp.py:230-254)."""
    c, selector = _contract_with_selector(
        x, aabb, spec.contraction_type, spec.num_dim
    )
    feats = hash_grid.encode(params["hash"]["table"], c, spec.hash_meta)
    out = apply_mlp(params["mlp_base"], feats, spec.mlp_base)
    raw_density, geo_feat = out[..., :1], out[..., 1:]
    density_act = transforms.DENSITY_ACTIVATIONS[spec.density_activation]
    density = density_act(raw_density) * selector[..., None]
    if return_feat:
        return density, geo_feat
    return density


def ngp_apply(params, x, direction, aabb, spec: NGPFieldSpec):
    """Radiance (..., radiance_dim) and density (..., 1) at world positions
    and view directions (external/ngp.py:269-280)."""
    density, geo_feat = ngp_query_density(
        params, x, aabb, spec, return_feat=True
    )
    if spec.use_viewdirs:
        d_enc = encoders.sh_encode(direction, spec.sh_degree)
        h = jnp.concatenate([d_enc, geo_feat], axis=-1)
    else:
        h = geo_feat
    radiance = apply_mlp(params["mlp_head"], h, spec.mlp_head)
    return radiance, density


# ----------------------------------------------------------------------------
# TensoRF-style VM-factorized radiance field (TPU-native fast path)
# ----------------------------------------------------------------------------
#
# Same head structure as the NGP field (base MLP -> density + geo features;
# SH direction encoding -> head MLP -> radiance), but the position encoding
# is the VM grid (ops/vm_grid.py): ~7x fewer random memory rows per sample
# than the hash grid on TPU at comparable capacity.  Selected with
# `nerf.arch: tensorf` — an additive extension of the reference's config
# surface ({ngp, mlp}, models/nerf.py:104-168).

@dataclasses.dataclass(frozen=True)
class TensoRFFieldSpec:
    vm_meta: "vm_grid.VMGridMeta"
    sh_degree: int
    mlp_base: MLPSpec
    mlp_head: MLPSpec
    geo_feat_dim: int
    density_activation: str
    contraction_type: str
    radiance_dim: int
    num_dim: int = 3
    use_viewdirs: bool = True
    remat: bool = False  # rematerialize field eval in the backward (memory)


def build_tensorf_spec(arch_config, contraction_type, radiance_dim,
                       num_dim=3):
    meta = vm_grid.build_meta(arch_config["vm_grid"], num_dim)
    sh_degree = int(arch_config["dir_encoding"]["degree"])
    base_cfg = arch_config["mlp_base"]
    head_cfg = arch_config["mlp_head"]
    geo_feat_dim = int(base_cfg["geo_feat_dim"])
    mlp_base = MLPSpec(
        input_dim=meta.output_dim,
        output_dim=1 + geo_feat_dim,
        net_depth=int(base_cfg["n_hidden_layers"]),
        net_width=int(base_cfg["n_neurons"]),
        skip_layer=None,
        hidden_activation=base_cfg["hidden_activation"],
        weight_norm=bool(base_cfg.get("weight_norm", False)),
    )
    mlp_head = MLPSpec(
        input_dim=encoders.sh_output_dim(sh_degree) + geo_feat_dim,
        output_dim=radiance_dim,
        net_depth=int(head_cfg["n_hidden_layers"]),
        net_width=int(head_cfg["n_neurons"]),
        skip_layer=None,
        hidden_activation=head_cfg["hidden_activation"],
        output_activation={
            "softplus": "softplus_out", "sigmoid": "sigmoid"
        }[head_cfg["radiance_activation"]],
        weight_norm=bool(head_cfg.get("weight_norm", False)),
    )
    return TensoRFFieldSpec(
        vm_meta=meta,
        sh_degree=sh_degree,
        mlp_base=mlp_base,
        mlp_head=mlp_head,
        geo_feat_dim=geo_feat_dim,
        density_activation=base_cfg["density_activation"],
        contraction_type=contraction_type,
        radiance_dim=radiance_dim,
        num_dim=num_dim,
        remat=bool(arch_config.get("remat", False)),
    )


def init_tensorf(key, spec: TensoRFFieldSpec):
    k_grid, k_base, k_head = jax.random.split(key, 3)
    return {
        "vm": vm_grid.init_params(k_grid, spec.vm_meta),
        "mlp_base": init_mlp(k_base, spec.mlp_base),
        "mlp_head": init_mlp(k_head, spec.mlp_head),
    }


def tensorf_query_density(params, x, aabb, spec: TensoRFFieldSpec,
                          return_feat=False):
    c, selector = _contract_with_selector(
        x, aabb, spec.contraction_type, spec.num_dim
    )
    feats = vm_grid.encode(params["vm"], c, spec.vm_meta)
    out = apply_mlp(params["mlp_base"], feats, spec.mlp_base)
    raw_density, geo_feat = out[..., :1], out[..., 1:]
    density_act = transforms.DENSITY_ACTIVATIONS[spec.density_activation]
    density = density_act(raw_density) * selector[..., None]
    if return_feat:
        return density, geo_feat
    return density


def tensorf_apply(params, x, direction, aabb, spec: TensoRFFieldSpec):
    density, geo_feat = tensorf_query_density(
        params, x, aabb, spec, return_feat=True
    )
    if spec.use_viewdirs:
        d_enc = encoders.sh_encode(direction, spec.sh_degree)
        h = jnp.concatenate([d_enc, geo_feat], axis=-1)
    else:
        h = geo_feat
    radiance = apply_mlp(params["mlp_head"], h, spec.mlp_head)
    return radiance, density


# ----------------------------------------------------------------------------
# vanilla NeRF MLP field (external/mlp.py:126-358)
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VanillaFieldSpec:
    trunk: MLPSpec
    sigma_layer: MLPSpec
    bottleneck: MLPSpec
    rgb_layer: MLPSpec
    pos_encoder_max_deg: int
    view_encoder_max_deg: int
    density_activation: str
    radiance_activation: str
    contraction_type: str
    radiance_dim: int
    num_dim: int = 3
    remat: bool = False  # rematerialize field eval in the backward (memory)


def build_vanilla_spec(arch_config, contraction_type, radiance_dim,
                       num_dim=3):
    pos_deg = int(arch_config["pos_encoder_max_deg"])
    view_deg = int(arch_config["view_encoder_max_deg"])
    pos_dim = encoders.sinusoidal_output_dim(num_dim, 0, pos_deg)
    view_dim = encoders.sinusoidal_output_dim(num_dim, 0, view_deg)
    wn = bool(arch_config["weight_norm"])
    hidden = arch_config["hidden_activation"]
    trunk = MLPSpec(
        input_dim=pos_dim,
        output_dim=0,
        net_depth=int(arch_config["net_depth"]),
        net_width=int(arch_config["net_width"]),
        skip_layer=int(arch_config["skip_layer"]),
        hidden_activation=hidden,
        output_enabled=False,
        weight_norm=wn,
    )
    trunk_out = trunk.final_dim
    sigma_layer = MLPSpec(
        input_dim=trunk_out, output_dim=1, net_depth=0,
        net_width=0, skip_layer=None, weight_norm=wn,
    )
    bottleneck = MLPSpec(
        input_dim=trunk_out, output_dim=int(arch_config["net_width"]),
        net_depth=0, net_width=0, skip_layer=None, weight_norm=wn,
    )
    rgb_layer = MLPSpec(
        input_dim=int(arch_config["net_width"]) + view_dim,
        output_dim=radiance_dim,
        net_depth=int(arch_config["net_depth_condition"]),
        net_width=int(arch_config["net_width_condition"]),
        skip_layer=None,
        hidden_activation=hidden,
        weight_norm=wn,
    )
    return VanillaFieldSpec(
        trunk=trunk,
        sigma_layer=sigma_layer,
        bottleneck=bottleneck,
        rgb_layer=rgb_layer,
        pos_encoder_max_deg=pos_deg,
        view_encoder_max_deg=view_deg,
        density_activation=arch_config["density_activation"],
        radiance_activation=arch_config["radiance_activation"],
        contraction_type=contraction_type,
        radiance_dim=radiance_dim,
        num_dim=num_dim,
        # 8x256 trunk activations at megasample counts exceed HBM as
        # backward residuals; recompute them instead
        remat=bool(arch_config.get("remat", True)),
    )


def init_vanilla(key, spec: VanillaFieldSpec):
    keys = jax.random.split(key, 4)
    return {
        "trunk": init_mlp(keys[0], spec.trunk),
        "sigma_layer": init_mlp(keys[1], spec.sigma_layer),
        "bottleneck": init_mlp(keys[2], spec.bottleneck),
        "rgb_layer": init_mlp(keys[3], spec.rgb_layer),
    }


def _vanilla_contract(x, aabb, spec):
    """Contract input space to [-pi, pi] (external/mlp.py:321-335)."""
    c, selector = _contract_with_selector(
        x, aabb, spec.contraction_type, spec.num_dim
    )
    return 2.0 * jnp.pi * (c - 0.5), selector


def vanilla_query_density(params, x, aabb, spec: VanillaFieldSpec):
    c, selector = _vanilla_contract(x, aabb, spec)
    h = encoders.sinusoidal_encode(c, 0, spec.pos_encoder_max_deg)
    h = apply_mlp(params["trunk"], h, spec.trunk)
    raw_sigma = apply_mlp(params["sigma_layer"], h, spec.sigma_layer)
    density_act = transforms.DENSITY_ACTIVATIONS[spec.density_activation]
    return density_act(raw_sigma) * selector[..., None]


def vanilla_apply(params, x, direction, aabb, spec: VanillaFieldSpec):
    c, selector = _vanilla_contract(x, aabb, spec)
    h = encoders.sinusoidal_encode(c, 0, spec.pos_encoder_max_deg)
    h = apply_mlp(params["trunk"], h, spec.trunk)
    raw_sigma = apply_mlp(params["sigma_layer"], h, spec.sigma_layer)
    bottleneck = apply_mlp(params["bottleneck"], h, spec.bottleneck)
    # direction unit vectors are scaled to length pi (external/mlp.py:354)
    d_enc = encoders.sinusoidal_encode(
        direction * jnp.pi, 0, spec.view_encoder_max_deg
    )
    raw_rgb = apply_mlp(
        params["rgb_layer"],
        jnp.concatenate([bottleneck, d_enc], axis=-1),
        spec.rgb_layer,
    )
    density_act = transforms.DENSITY_ACTIVATIONS[spec.density_activation]
    radiance_act = transforms.RADIANCE_ACTIVATIONS[spec.radiance_activation]
    return radiance_act(raw_rgb), density_act(raw_sigma) * selector[..., None]


# ----------------------------------------------------------------------------
# architecture dispatch
# ----------------------------------------------------------------------------

FieldSpec = Tuple  # NGPFieldSpec | VanillaFieldSpec


def build_field_spec(arch, arch_config, contraction_type, radiance_dim,
                     num_dim=3):
    if arch == "ngp":
        return build_ngp_spec(arch_config, contraction_type, radiance_dim,
                              num_dim)
    if arch == "tensorf":
        return build_tensorf_spec(arch_config, contraction_type,
                                  radiance_dim, num_dim)
    if arch == "mlp":
        return build_vanilla_spec(arch_config, contraction_type,
                                  radiance_dim, num_dim)
    raise NotImplementedError(arch)


def init_field(key, spec):
    if isinstance(spec, NGPFieldSpec):
        return init_ngp(key, spec)
    if isinstance(spec, TensoRFFieldSpec):
        return init_tensorf(key, spec)
    return init_vanilla(key, spec)


def field_query_density(params, x, aabb, spec):
    if isinstance(spec, NGPFieldSpec):
        return ngp_query_density(params, x, aabb, spec)
    if isinstance(spec, TensoRFFieldSpec):
        return tensorf_query_density(params, x, aabb, spec)
    return vanilla_query_density(params, x, aabb, spec)


def field_apply(params, x, direction, aabb, spec):
    if isinstance(spec, NGPFieldSpec):
        return ngp_apply(params, x, direction, aabb, spec)
    if isinstance(spec, TensoRFFieldSpec):
        return tensorf_apply(params, x, direction, aabb, spec)
    return vanilla_apply(params, x, direction, aabb, spec)
