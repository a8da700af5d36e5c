"""Affine alignment of affine-ambiguous predicted log intensities.

Counterpart of the reference's evaluation-time least-squares alignment
(robust_e_nerf.py:639-677): per channel, solve in float64

    scale * pred_log + offset  ~=  target_log      (least squares)

over all pixels of all evaluation images at once, then apply to the
predictions.  Runs on the host in numpy float64 — the lstsq is tiny and
precision matters more than speed.
"""

from __future__ import annotations

import numpy as np


def align_log_intensities(pred_log, target_log):
    """Args: (N, C, H, W) predicted / target log-intensity images.
    Returns (aligned pred_log (N, C, H, W), per-channel (scale, offset))."""
    pred_log = np.asarray(pred_log, dtype=np.float64)
    target_log = np.asarray(target_log, dtype=np.float64)
    assert pred_log.shape == target_log.shape and pred_log.ndim == 4
    n, c, h, w = pred_log.shape

    aligned = np.empty_like(pred_log)
    params = []
    for ch in range(c):
        x = pred_log[:, ch].reshape(-1)
        y = target_log[:, ch].reshape(-1)
        a = np.stack([x, np.ones_like(x)], axis=1)  # (P, 2)
        solution, *_ = np.linalg.lstsq(a, y[:, None], rcond=None)
        aligned[:, ch] = (a @ solution).reshape(n, h, w)
        params.append((float(solution[0, 0]), float(solution[1, 0])))
    return aligned, params
