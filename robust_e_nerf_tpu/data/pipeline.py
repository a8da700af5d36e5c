"""Fixed-shape training batch assembly (host side).

The reference mutates the dataloader batch size every step to hold the total
ray-sample count constant (robust_e_nerf.py:907-950, utils/datasets.py:20-32).
Under XLA a changing batch shape would recompile, so the batcher emits
*fixed-capacity* buffers: `capacity` rows, the first `batch_size` of which
are real samples (`valid_mask`).  Masked rays march zero samples and are
excluded from every mean, so the training dynamics are those of the dynamic
batch size while the compiled program never changes shape.

Timestamps: device times are a two-float (hi, lo) pair of float32 seconds
re-based to the first pose time — `hi + lo` carries the full float64
precision of the int64-ns source, so microsecond inter-event intervals
survive at t = 20+ s where a single f32 has only ~2 us resolution (the
reference keeps int64 ns + float64 samplers, datamodule.py:157-196).
`interval` is computed exactly on int64 nanoseconds before conversion.
"""

from __future__ import annotations

import numpy as np

from . import camera_poses as poses_mod
from . import samplers as samplers_mod


def split_two_float(t_f64):
    """float64 seconds -> (hi, lo) float32 pair with hi + lo == t exactly
    to f32-pair precision (classic double-float split)."""
    t_f64 = np.asarray(t_f64, np.float64)
    hi = t_f64.astype(np.float32)
    lo = (t_f64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def build_event_table(events, t0_ns, has_bayer):
    """Transformed events -> fixed dtype arrays ready for device residency.

    `start_ts_hi/lo` is a two-float split of f64 seconds re-based to t0;
    `interval` is exact int64 differencing converted to seconds (never
    re-derived from rounded absolute times).  The table is what the jitted
    step gathers batches from (the streaming fixed-shape pipeline of
    SURVEY.md section 5.7).
    """
    start_hi, start_lo = split_two_float(
        poses_mod.rebase_timestamps_ns(events["start_ts"], t0_ns)
    )
    table = {
        "position": np.asarray(events["position"], np.float32),
        "start_ts_hi": start_hi,
        "start_ts_lo": start_lo,
        "interval": poses_mod.intervals_seconds(
            events["start_ts"], events["end_ts"]
        ).astype(np.float32),
        "num_pos": np.asarray(events["num_pos"], np.float32),
        "num_neg": np.asarray(events["num_neg"], np.float32),
    }
    if has_bayer:
        table["channel_idx"] = np.asarray(events["channel_idx"], np.int32)
    return table


class EventBatcher:
    """Host-side batch assembly — the fallback path for event tables too
    large for device residency, and the reference semantics oracle for
    tests."""

    def __init__(self, events, t0_ns, capacity, rng, has_bayer,
                 init_batch_size):
        """Args:
          events: transformed-event dict (int64-ns start/end timestamps)
          t0_ns: re-basing origin (first pose timestamp)
          capacity: static row count of every emitted batch
          rng: np.random.Generator (already rank-offset for multi-process)
          init_batch_size: initial dynamic batch size (<= capacity)
        """
        self.capacity = int(capacity)
        self.rng = rng
        self.has_bayer = has_bayer
        self.batch_size = int(init_batch_size)
        self.num_events = len(events["position"])
        assert self.batch_size <= self.capacity

        table = build_event_table(events, t0_ns, has_bayer)
        self.position = table["position"]
        self.start_ts_hi = table["start_ts_hi"]
        self.start_ts_lo = table["start_ts_lo"]
        self.interval = table["interval"]
        self.num_pos = table["num_pos"]
        self.num_neg = table["num_neg"]
        if has_bayer:
            self.channel_idx = table["channel_idx"]
        self.samplers = samplers_mod.build_normalized_samplers(rng)

    def set_batch_size(self, batch_size):
        """The dynamic batch-size controller's entry point
        (robust_e_nerf.py:940-948)."""
        self.batch_size = int(np.clip(batch_size, 1, self.capacity))

    def next_batch(self):
        cap = self.capacity
        idx = self.rng.integers(0, self.num_events, size=cap)
        batch = {
            "position": self.position[idx],
            "start_ts_hi": self.start_ts_hi[idx],
            "start_ts_lo": self.start_ts_lo[idx],
            "interval": self.interval[idx],
            "num_pos": self.num_pos[idx],
            "num_neg": self.num_neg[idx],
            "valid": np.arange(cap) < self.batch_size,
            "normalized_ts_diff": self.samplers["ts_diff"](cap).astype(
                np.float32
            ),
            "normalized_diff_start_ts": self.samplers["diff_start_ts"](
                cap
            ).astype(np.float32),
            "normalized_grad_ts": self.samplers["grad_ts"](cap).astype(
                np.float32
            ),
        }
        if self.has_bayer:
            batch["channel_idx"] = self.channel_idx[idx]
        return batch


def trim_length(total_len, stage_dataset_ratio, stage_eff_batch_size):
    """`*_dataset_ratio` semantics (datamodule.py:119-137): an int means
    that many effective batches, a float a dataset fraction."""
    if isinstance(stage_dataset_ratio, int) and not isinstance(
        stage_dataset_ratio, bool
    ):
        subset_len = stage_dataset_ratio * stage_eff_batch_size
        assert subset_len <= total_len
        return subset_len
    assert 0.0 < stage_dataset_ratio <= 1.0
    return int(stage_dataset_ratio * total_len)
