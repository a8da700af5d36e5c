#!/usr/bin/env python
"""Convert a reference Robust e-NeRF Lightning checkpoint to this
framework's .npz format.

Usage:  python scripts/convert_reference_ckpt.py <ref.ckpt> <out.npz>

A user of the reference (wengflow/robust-e-nerf) can bring a trained
model across: the converted .npz loads through the standard
`model.checkpoint_filepath` + `model.*.load_state_dict` config flags.

Reference state-dict names (torch parametrize / Lightning attribute
paths, see /root/reference/robust_e_nerf/models/*.py):

  contrast_threshold.parametrizations.p2n_contrast_threshold_ratio.original
      pre-softplus ratio (event_generation_params.py:52-57)
  refractory_period.parametrizations._refractory_period.original
      pre-(scaled-shifted-sigmoid) logits, float64
      (event_generation_params.py:162-168)
  nerf.parametrizations.render_bkgd.original
      pre-softplus learnable background (models/nerf.py:79-90)
  nerf.radiance_field.mlp_base.0.params
      the tcnn grid-encoding flat parameter vector (external/ngp.py:166-174);
      entry-major [level][entry][feature] with tcnn's 8-entry alignment —
      the exact layout of ops/hash_grid.py's (total_entries, F) table
  nerf.radiance_field.mlp_base.1.hidden_layers.{i}.{weight,bias}
  nerf.radiance_field.mlp_base.1.output_layer.{weight,bias}
  nerf.radiance_field.mlp_head.hidden_layers.{i}.{weight,bias}
  nerf.radiance_field.mlp_head.output_layer.{weight,bias}
      torch Linear stores weight as (out, in); ours is (in, out)
      (external/mlp.py:26-115; weight-normed layers store weight_g (out,1)
      + weight_v (out, in))
  nerf.radiance_field.mlp.{base,sigma_layer,bottleneck_layer,rgb_layer}...
      the vanilla arch (external/mlp.py:246-208)
  nerf.occupancy_grid.{occs,_binary}
      nerfacc 0.3.1 buffers; x-major flat layout matches
      models/occupancy.py's
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _np(t):
    return np.asarray(t.detach().cpu().numpy())


def _linear(flat, out_prefix, sd, in_prefix):
    """One torch Linear -> {w, b} or {v, g, b} (weight-normed)."""
    if f"{in_prefix}.weight_v" in sd:
        flat[f"{out_prefix}/v"] = _np(sd[f"{in_prefix}.weight_v"]).T
        flat[f"{out_prefix}/g"] = _np(
            sd[f"{in_prefix}.weight_g"]
        ).reshape(-1)
    else:
        flat[f"{out_prefix}/w"] = _np(sd[f"{in_prefix}.weight"]).T
    flat[f"{out_prefix}/b"] = _np(sd[f"{in_prefix}.bias"])


def _mlp(flat, out_prefix, sd, in_prefix):
    """A reference MLP module -> our {hidden/i/..., output/...} keys."""
    i = 0
    while f"{in_prefix}.hidden_layers.{i}.weight" in sd or (
        f"{in_prefix}.hidden_layers.{i}.weight_v" in sd
    ):
        _linear(flat, f"{out_prefix}/hidden/{i}", sd,
                f"{in_prefix}.hidden_layers.{i}")
        i += 1
    if f"{in_prefix}.output_layer.weight" in sd or (
        f"{in_prefix}.output_layer.weight_v" in sd
    ):
        _linear(flat, f"{out_prefix}/output", sd,
                f"{in_prefix}.output_layer")


def convert_state_dict(sd, n_features_per_level=2):
    """Reference state dict (name -> torch tensor) -> our flat npz dict."""
    flat = {}

    key = ("contrast_threshold.parametrizations."
           "p2n_contrast_threshold_ratio.original")
    if key in sd:
        flat["params/contrast_threshold/raw_p2n_ratio"] = _np(
            sd[key]
        ).astype(np.float32)
    key = ("refractory_period.parametrizations."
           "_refractory_period.original")
    if key in sd:
        flat["params/refractory_period/raw_tau"] = _np(sd[key]).astype(
            np.float32
        )
    key = "nerf.parametrizations.render_bkgd.original"
    if key in sd:
        flat["params/nerf/render_bkgd_raw"] = _np(sd[key]).astype(
            np.float32
        )

    rf = "params/nerf/radiance_field"
    # ngp arch
    key = "nerf.radiance_field.mlp_base.0.params"
    if key in sd:
        flat[f"{rf}/hash/table"] = _np(sd[key]).reshape(
            -1, n_features_per_level
        ).astype(np.float32)
        _mlp(flat, f"{rf}/mlp_base", sd,
             "nerf.radiance_field.mlp_base.1")
        _mlp(flat, f"{rf}/mlp_head", sd, "nerf.radiance_field.mlp_head")
    # vanilla arch
    if "nerf.radiance_field.mlp.base.hidden_layers.0.weight" in sd or (
        "nerf.radiance_field.mlp.base.hidden_layers.0.weight_v" in sd
    ):
        _mlp(flat, f"{rf}/trunk", sd, "nerf.radiance_field.mlp.base")
        _mlp(flat, f"{rf}/sigma_layer", sd,
             "nerf.radiance_field.mlp.sigma_layer")
        _mlp(flat, f"{rf}/bottleneck", sd,
             "nerf.radiance_field.mlp.bottleneck_layer")
        _mlp(flat, f"{rf}/rgb_layer", sd,
             "nerf.radiance_field.mlp.rgb_layer")

    # occupancy grid (restored with the nerf component, trainer.py)
    if "nerf.occupancy_grid.occs" in sd:
        flat["occ/occs"] = _np(sd["nerf.occupancy_grid.occs"]).reshape(
            -1
        ).astype(np.float32)
    if "nerf.occupancy_grid._binary" in sd:
        flat["occ/binary"] = _np(
            sd["nerf.occupancy_grid._binary"]
        ).reshape(-1).astype(bool)
    return flat


def main():
    import torch

    ckpt_path, out_path = sys.argv[1], sys.argv[2]
    try:
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning checkpoints embed non-tensor objects (easydict
        # hyperparameters), which the safe loader rejects.  Falling back
        # executes the checkpoint's pickle stream — only convert
        # checkpoints you trained yourself.
        print(
            "WARNING: safe (weights_only) load failed; falling back to "
            "full unpickling — only do this with checkpoints from a "
            "trusted source",
            file=sys.stderr,
        )
        ckpt = torch.load(ckpt_path, map_location="cpu",
                          weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    hparams = ckpt.get("hyper_parameters", {})
    try:
        n_feats = int(
            hparams["model"]["nerf"]["ngp"]["pos_encoding"]
            ["n_features_per_level"]
        )
    except (KeyError, TypeError):
        n_feats = 2

    flat = convert_state_dict(sd, n_features_per_level=n_feats)
    meta = {"hparams": {"converted_from": os.path.abspath(ckpt_path)}}
    np.savez(
        out_path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **flat,
    )
    print(f"wrote {out_path} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
