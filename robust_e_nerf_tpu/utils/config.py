"""Dot-access config loading.

The reference consumes one YAML file per run and wraps it in `easydict`
(reference: scripts/run.py:23-24).  We keep the YAML schema byte-compatible
and provide our own small dot-access dict so preprocessed configs interchange.
"""

from __future__ import annotations

import copy
import io
import os

import yaml


class DotDict(dict):
    """A dict whose items are also reachable as attributes (recursively)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for key, value in list(self.items()):
            self[key] = self._wrap(value)

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, dict) and not isinstance(value, DotDict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return DotDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_plain(self):
        """Recursively convert back to built-in dicts/lists (for YAML dump)."""

        def unwrap(value):
            if isinstance(value, DotDict):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, dict):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [unwrap(v) for v in value]
            return value

        return unwrap(self)


def load_config(path_or_stream) -> DotDict:
    """Load a run config YAML into a DotDict (reference: run.py:23-24)."""
    if isinstance(path_or_stream, (str, os.PathLike)):
        with open(path_or_stream) as f:
            raw = yaml.safe_load(f)
    elif isinstance(path_or_stream, io.IOBase):
        raw = yaml.safe_load(path_or_stream)
    else:  # already a mapping
        raw = dict(path_or_stream)
    return DotDict(raw)


def save_config(config, path):
    with open(path, "w") as f:
        yaml.safe_dump(
            config.to_plain() if isinstance(config, DotDict) else config,
            f,
            sort_keys=False,
        )
