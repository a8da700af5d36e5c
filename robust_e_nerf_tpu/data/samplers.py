"""Normalized supervision-timestamp samplers (host side, float64).

Counterpart of `data/samplers.py` (UniformSampler, TruncatedNormalSampler,
DiracDeltaSampler) joined per batch by the DataModule
(datamodule.py:149-196):

  ts_diff        ~ DiracDelta(1)
  diff_start_ts  ~ U[0, 1]
  grad_ts        ~ TruncNormal(mean=0.5, std=0.25, [0, 1])
"""

from __future__ import annotations

import numpy as np

from ..utils import tensor_ops


class UniformSampler:
    def __init__(self, low, high, rng):
        self.low, self.high, self.rng = low, high, rng

    def __call__(self, size):
        return (
            (self.high - self.low) * self.rng.random(size, dtype=np.float64)
            + self.low
        )


class TruncatedNormalSampler:
    def __init__(self, low, high, mean, std, rng):
        self.low, self.high = low, high
        self.mean, self.std = mean, std
        self.rng = rng

    def __call__(self, size):
        return tensor_ops.trunc_normal(
            self.low, self.high, size, self.mean, self.std, self.rng
        )


class DiracDeltaSampler:
    def __init__(self, center):
        self.center = center

    def __call__(self, size):
        return np.full(size, self.center, dtype=np.float64)


def build_normalized_samplers(rng):
    """The three samplers with the reference's distributions
    (datamodule.py:157-196)."""
    return {
        "ts_diff": DiracDeltaSampler(center=1.0),
        "diff_start_ts": UniformSampler(0.0, 1.0, rng),
        "grad_ts": TruncatedNormalSampler(0.0, 1.0, 0.5, 0.25, rng),
    }
