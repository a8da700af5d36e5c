"""Event dataset: raw stream -> event-pair training records (host side).

Counterpart of the reference `data/datasets.py:14-373` (class Event).  The
reference builds per-pixel 2-deep sliding windows in an O(N) Python loop
(datasets.py:189-284); here the same pairing is a vectorized pass — a stable
sort by pixel (which preserves per-pixel stream order) plus shifted
comparisons — typically ~1000x faster on real streams.

Semantics reproduced exactly:
  * each event is paired with its predecessor at the same pixel:
    {position, start_ts=t_prev, end_ts=t_cur, num_pos, num_neg};
  * the first event at a pixel and zero-duration pairs are dropped
    (datasets.py:253-259);
  * for the 2-deep window, num_pos = polarity of the *current* event (the
    predecessor only provides the interval start), num_neg = 1 - num_pos
    (datasets.py:267-274);
  * the maximum refractory period is the minimum inter-event interval over
    all per-pixel substreams after collapsing duplicate timestamps
    (datasets.py:132-187);
  * optional Bayer colorization from pixel-position parity
    (datasets.py:286-328) and undistortion via cv2 (datasets.py:330-364).

On-disk formats are kept interchangeable with the reference: inputs are the
same `raw_events.npz` / `camera_calibration.npz`; the transformed-event
cache is written as `events_tpu.npz` (int64-ns timestamps preserved) and the
reference's torch `events.pt` cache is also readable when present.
"""

from __future__ import annotations

import os

import numpy as np

RAW_EVENTS_FILENAME = "raw_events.npz"
CAMERA_CALIBRATION_FILENAME = "camera_calibration.npz"
TF_EVENTS_FILENAME = "events_tpu.npz"
TORCH_TF_EVENTS_FILENAME = "events.pt"  # reference cache (read-only compat)
MAX_REFRACTORY_PERIOD_FILENAME = "max_refractory_period_tpu.npy"

NULL_BAYER_PATTERN = ""
BAYER_PATTERN_LEN = 4
COLOR_CHANNEL_NAME_TO_INDEX = {"R": 0, "G": 1, "B": 2}


# ----------------------------------------------------------------------------
# loading
# ----------------------------------------------------------------------------

def load_raw_events(root_directory):
    return np.load(os.path.join(root_directory, RAW_EVENTS_FILENAME))


def load_camera_calibration(root_directory):
    return np.load(
        os.path.join(root_directory, CAMERA_CALIBRATION_FILENAME),
        allow_pickle=False,
    )


def bayer_pattern_of(camera_calibration):
    return str(camera_calibration["bayer_pattern"])


def has_bayer_filter(camera_calibration):
    return bayer_pattern_of(camera_calibration) != NULL_BAYER_PATTERN


# ----------------------------------------------------------------------------
# vectorized pairing
# ----------------------------------------------------------------------------

def pair_events(positions, timestamps, polarities, img_width):
    """Pair each event with its per-pixel predecessor (vectorized).

    Args:
      positions: (N, 2) integer (x, y)
      timestamps: (N,) int64 (any monotone unit; per-pixel stream order is
        whatever the array order is, matching the reference's deque order)
      polarities: (N,) bool or {0, 1}
      img_width: pixels per row (for the flat pixel id)

    Returns dict of arrays in original stream order, filtered to valid pairs:
      position (M, 2) int64, start_ts (M,) int64, end_ts (M,) int64,
      num_pos (M,) int64, num_neg (M,) int64, index (M,) original indices.
    """
    positions = np.asarray(positions).astype(np.int64)
    timestamps = np.asarray(timestamps).astype(np.int64)
    polarities = np.asarray(polarities).astype(np.int64)
    n = len(positions)
    assert len(timestamps) == n and len(polarities) == n

    pixel_id = positions[:, 1] * np.int64(img_width) + positions[:, 0]
    order = np.argsort(pixel_id, kind="stable")

    pid_sorted = pixel_id[order]
    ts_sorted = timestamps[order]

    same_pixel_as_prev = np.empty(n, dtype=bool)
    same_pixel_as_prev[0] = False
    same_pixel_as_prev[1:] = pid_sorted[1:] == pid_sorted[:-1]

    prev_ts = np.empty(n, dtype=np.int64)
    prev_ts[0] = 0
    prev_ts[1:] = ts_sorted[:-1]

    valid_sorted = same_pixel_as_prev & (prev_ts != ts_sorted)

    # scatter back to stream order
    valid = np.zeros(n, dtype=bool)
    start_ts = np.zeros(n, dtype=np.int64)
    valid[order] = valid_sorted
    start_ts[order] = prev_ts

    index = np.nonzero(valid)[0]
    num_pos = polarities[index]
    return {
        "position": positions[index],
        "start_ts": start_ts[index],
        "end_ts": timestamps[index],
        "num_pos": num_pos,
        "num_neg": 1 - num_pos,
        "index": index,
    }


def extract_max_refractory_period(positions, timestamps, img_width):
    """Minimum inter-event interval over all per-pixel substreams, with
    duplicate timestamps collapsed (datasets.py:132-187).  Returns int64 (or
    +inf float if no pixel ever fires twice)."""
    positions = np.asarray(positions).astype(np.int64)
    timestamps = np.asarray(timestamps).astype(np.int64)
    n = len(positions)
    pixel_id = positions[:, 1] * np.int64(img_width) + positions[:, 0]
    order = np.argsort(pixel_id, kind="stable")
    pid_sorted = pixel_id[order]
    ts_sorted = timestamps[order]

    # collapse consecutive duplicate timestamps within a pixel
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (pid_sorted[1:] == pid_sorted[:-1]) & (
        ts_sorted[1:] == ts_sorted[:-1]
    )
    pid_dedup = pid_sorted[~dup]
    ts_dedup = ts_sorted[~dup]

    same = pid_dedup[1:] == pid_dedup[:-1]
    intervals = ts_dedup[1:] - ts_dedup[:-1]
    intervals = intervals[same]
    if intervals.size == 0:
        return np.inf
    return np.int64(intervals.min())


# ----------------------------------------------------------------------------
# colorization & undistortion
# ----------------------------------------------------------------------------

def colorize_events(events, camera_calibration):
    """Append `channel_idx` from Bayer-position parity (datasets.py:286-328).
    No-op for monochrome sensors."""
    pattern = bayer_pattern_of(camera_calibration)
    if pattern == NULL_BAYER_PATTERN:
        return events
    assert len(pattern) == BAYER_PATTERN_LEN
    assert set(pattern) == set(COLOR_CHANNEL_NAME_TO_INDEX)
    channel_of_quadrant = np.array(
        [COLOR_CHANNEL_NAME_TO_INDEX[c] for c in pattern], dtype=np.uint8
    )
    pos = np.asarray(events["position"]).astype(np.int64)
    x_odd = (pos[:, 0] % 2).astype(np.int64)
    y_odd = (pos[:, 1] % 2).astype(np.int64)
    # quadrant order: top-left, top-right, bottom-left, bottom-right
    quadrant = y_odd * 2 + x_odd
    events = dict(events)
    events["channel_idx"] = channel_of_quadrant[quadrant]
    return events


def undistort_events(events, camera_calibration):
    """Undistort pixel coordinates (datasets.py:330-364).

    Optimization over the reference: only the unique integer pixel grid is
    pushed through cv2, then gathered — bit-identical results, O(H*W)
    instead of O(N) cv2 work.
    """
    events = dict(events)
    distortion_model = str(camera_calibration["distortion_model"])
    distortion_params = np.asarray(camera_calibration["distortion_params"])
    intrinsics = np.asarray(camera_calibration["intrinsics"])
    assert len(distortion_params) in (0, 4)

    positions = np.asarray(events["position"]).astype(np.float32)
    if len(distortion_params) == 0:
        events["position"] = positions
        return events

    import cv2

    int_pos = np.asarray(events["position"]).astype(np.int64)
    img_w = int(camera_calibration["img_width"])
    flat = int_pos[:, 1] * img_w + int_pos[:, 0]
    unique_flat, inverse = np.unique(flat, return_inverse=True)
    unique_xy = np.stack(
        [unique_flat % img_w, unique_flat // img_w], axis=1
    ).astype(np.float64)

    if distortion_model == "plumb_bob":
        undist = cv2.undistortPoints(
            unique_xy[:, None, :].astype(np.float32), intrinsics,
            distortion_params, P=intrinsics,
        )[:, 0, :]
    elif distortion_model == "equidistant":
        undist = cv2.fisheye.undistortPoints(
            unique_xy[:, None, :].astype(np.float32), intrinsics,
            distortion_params, P=intrinsics,
        )[:, 0, :]
    else:
        raise NotImplementedError(distortion_model)

    events["position"] = undist[inverse].astype(np.float32)
    return events


# ----------------------------------------------------------------------------
# caching & the full transform pipeline
# ----------------------------------------------------------------------------

def load_transformed_events(root_directory):
    npz_path = os.path.join(root_directory, TF_EVENTS_FILENAME)
    if os.path.isfile(npz_path):
        with np.load(npz_path) as data:
            return {k: data[k] for k in data.files}
    pt_path = os.path.join(root_directory, TORCH_TF_EVENTS_FILENAME)
    if os.path.isfile(pt_path):
        import torch

        loaded = torch.load(pt_path, map_location="cpu",
                            weights_only=False)
        return {k: np.asarray(v) for k, v in loaded.items()}
    return None


def save_transformed_events(events, root_directory):
    np.savez(
        os.path.join(root_directory, TF_EVENTS_FILENAME),
        **{k: np.asarray(v) for k, v in events.items()},
    )


def load_or_build_transformed_events(root_directory):
    """events.pt-equivalent cache protocol (datasets.py:43-55,84-95)."""
    events = load_transformed_events(root_directory)
    if events is not None:
        return events
    calibration = load_camera_calibration(root_directory)
    raw = load_raw_events(root_directory)
    events = pair_events(
        raw["position"], raw["timestamp"], raw["polarity"],
        int(calibration["img_width"]),
    )
    events.pop("index")
    events = colorize_events(events, calibration)
    events = undistort_events(events, calibration)
    save_transformed_events(events, root_directory)
    return events


def load_or_build_max_refractory_period(root_directory):
    """max_refractory_period.pt-equivalent cache (datasets.py:101-130).
    Returns int64 nanoseconds."""
    path = os.path.join(root_directory, MAX_REFRACTORY_PERIOD_FILENAME)
    if os.path.isfile(path):
        return np.load(path)
    # reference torch cache compat
    pt_path = os.path.join(root_directory, "max_refractory_period.pt")
    if os.path.isfile(pt_path):
        import torch

        value = torch.load(pt_path, map_location="cpu", weights_only=False)
        return np.asarray(value)
    calibration = load_camera_calibration(root_directory)
    raw = load_raw_events(root_directory)
    value = extract_max_refractory_period(
        raw["position"], raw["timestamp"], int(calibration["img_width"])
    )
    np.save(path, value)
    return value


def permute_events(events, permutation_seed):
    """Seeded permutation to emulate sparse events (datasets.py:57-65)."""
    if permutation_seed is None:
        return events
    from ..utils import tensor_ops

    perm = tensor_ops.randperm_manual_seed(
        len(events["position"]), permutation_seed
    )
    return {k: np.asarray(v)[perm] for k, v in events.items()}
