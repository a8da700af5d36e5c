"""Checkpointing: full train-state save/restore + component-wise load.

Counterpart of Lightning's ModelCheckpoint plus the reference's
component-wise restore (robust_e_nerf.py:265-292, modules.py:16-35): each of
{contrast_threshold, refractory_period, nerf} is a top-level key of the
parameter pytree, so extraction is a prefix filter over the flat dict.

Format: a single .npz of flat-keyed arrays (params/..., occ/..., plus step
and controller state) — portable, no framework lock-in.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..utils import pytree

MODEL_COMPONENTS = ("contrast_threshold", "refractory_period", "nerf")


def save_checkpoint(path, params, opt_state, occ_state, step, batch_size,
                    hparams=None):
    """`opt_state=None` writes a weights-only checkpoint (the
    `checkpoint.save_weights_only` config key, run.py:67 /
    configs/train/synthetic.yaml:139): model parameters and occupancy
    buffers, but no optimizer state."""
    flat = {}
    for prefix, tree in (
        ("params", params),
        ("occ", occ_state),
    ):
        for key, value in pytree.tree_to_flat_dict(tree).items():
            flat[f"{prefix}/{key}"] = value
    if opt_state is not None:
        # optimizer state contains ints/None-like leaves too; store what's
        # array
        for key, value in pytree.tree_to_flat_dict(opt_state).items():
            flat[f"opt/{key}"] = value
    flat["step"] = np.int64(step)
    flat["batch_size"] = np.int64(batch_size)
    meta = {"hparams": hparams or {}}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **flat,
    )


def resolve_checkpoint_path(path):
    """Resolve `model.checkpoint_filepath` conveniences, the counterpart of
    Lightning's `ckpt_path="best"` (trainer.test(ckpt_path=...)):

    - a `best.json` sidecar (written by Trainer.save_checkpoint) resolves
      to its recorded `best_model_path`;
    - a directory resolves through `<dir>/best.json` or
      `<dir>/checkpoints/best.json`;
    - anything else (a concrete .npz) passes through unchanged.
    """
    path = os.fspath(path)
    if os.path.isdir(path):
        for cand in (os.path.join(path, "best.json"),
                     os.path.join(path, "checkpoints", "best.json")):
            if os.path.isfile(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no best.json under checkpoint directory {path!r}")
    if os.path.basename(path) == "best.json":
        with open(path) as f:
            best = json.load(f).get("best_model_path")
        if not best:
            raise FileNotFoundError(f"{path!r} records no best_model_path")
        if not os.path.isabs(best) and not os.path.isfile(best):
            # stored repo-relative but cwd moved: try relative to the sidecar
            rel = os.path.join(os.path.dirname(path), os.path.basename(best))
            best = rel if os.path.isfile(rel) else best
        return best
    return path


def load_checkpoint_flat(path):
    with np.load(resolve_checkpoint_path(path), allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def load_hparams(path_or_flat):
    """The checkpoint's embedded hyperparameters (the full run config +
    seed, the counterpart of Lightning's `save_hyperparameters`,
    robust_e_nerf.py:162-173 / datamodule.py:56-60)."""
    flat = (
        load_checkpoint_flat(path_or_flat)
        if isinstance(path_or_flat, (str, os.PathLike)) else path_or_flat
    )
    meta = json.loads(bytes(flat["__meta__"]).decode())
    return meta.get("hparams", {})


def restore_params(flat, params_like):
    sub = {
        k[len("params/"):]: v for k, v in flat.items()
        if k.startswith("params/")
    }
    return pytree.flat_dict_to_tree(sub, params_like)


def restore_component(flat, params, component):
    """Load one model component's parameters from a full checkpoint
    (robust_e_nerf.py:265-287)."""
    assert component in MODEL_COMPONENTS
    prefix = f"params/{component}/"
    sub = {k[len(prefix):]: v for k, v in flat.items()
           if k.startswith(prefix)}
    if not sub:
        raise KeyError(f"checkpoint has no component {component!r}")
    new_params = dict(params)
    new_params[component] = pytree.flat_dict_to_tree(
        sub, params[component]
    )
    return new_params


def restore_occ_state(flat, occ_like):
    sub = {k[len("occ/"):]: v for k, v in flat.items()
           if k.startswith("occ/")}
    return pytree.flat_dict_to_tree(sub, occ_like)


def restore_opt_state(flat, opt_like):
    sub = {k[len("opt/"):]: v for k, v in flat.items()
           if k.startswith("opt/")}
    return pytree.flat_dict_to_tree(sub, opt_like)


def load_model_components(checkpoint_filepath, params, load_flags):
    """Apply the `load_state_dict` flags (robust_e_nerf.py:265-287)."""
    if not any(load_flags.values()):
        return params
    flat = load_checkpoint_flat(checkpoint_filepath)
    for component in MODEL_COMPONENTS:
        if load_flags.get(component):
            params = restore_component(flat, params, component)
            print(f'Loaded the state of "{component}" from checkpoint!')
    return params
