"""Pytree helpers: component extraction, freezing masks, flat IO.

The reference supports component-wise checkpoint load & freeze for
{contrast_threshold, refractory_period, nerf}
(robust_e_nerf.py:265-292, modules.py:6-35).  Here model components are
top-level keys of the parameter pytree, so extraction is a dict lookup and
freezing is an optax mask.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def tree_to_flat_dict(tree):
    """Flatten a pytree of arrays into {path_string: np.ndarray}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_entry_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_entry_str(entry):
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return str(entry.name)
    return str(entry)


def flat_dict_to_tree(flat, like):
    """Rebuild a pytree with the structure of `like` from a flat dict."""
    paths = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths[0]:
        key = "/".join(_path_entry_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"missing parameter {key!r} in checkpoint")
        value = np.asarray(flat[key])
        if leaf is not None and hasattr(leaf, "shape"):
            if tuple(value.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for {key!r}: checkpoint "
                    f"{value.shape} vs model {np.shape(leaf)}"
                )
        leaves.append(value)
    return jax.tree_util.tree_unflatten(paths[1], leaves)


def save_tree_npz(tree, path, extra_meta=None):
    """Save a pytree of arrays to an .npz with a JSON key manifest."""
    flat = tree_to_flat_dict(tree)
    meta = {"keys": sorted(flat.keys())}
    if extra_meta:
        meta.update(extra_meta)
    np.savez(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **flat)


def load_tree_npz(path, like=None):
    """Load a flat dict (and optionally restructure it like `like`)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files if k != "__meta__"}
    if like is None:
        return flat
    return flat_dict_to_tree(flat, like)


def component_labels(params, label_fn):
    """Map every leaf of `params` to a string label via label_fn(path_key)."""
    def assign(path, _leaf):
        key = "/".join(_path_entry_str(p) for p in path)
        return label_fn(key)

    return jax.tree_util.tree_map_with_path(assign, params)
