"""Evaluation metrics (host side, numpy float32 — matches torch defaults).

Counterpart of `loss_metric/metric.py` (class Metric):

  l1    — plain mean absolute error over pixels (& channels)        (:60-62)
  psnr  — data_range = target value range (relative metric)         (:64-72),
          torchmetrics-0.6.2 semantics: per-image over dims (C,H,W)
  ssim  — data_range = max target value (absolute metric)           (:74-81),
          torchmetrics-0.6.2 semantics: 11x11 gaussian (sigma 1.5),
          reflect padding, then the padded border is cropped before the
          mean so only fully-interior windows count
  lpips — AlexNet perceptual distance on [-1, 1]-renormalized images
          (:83-90); computed by loss_metric/lpips_jax.py when weights are
          available, otherwise reported as None
"""

from __future__ import annotations

import numpy as np

METRIC_NAMES = ("l1", "psnr", "ssim", "lpips")


def _gaussian_kernel_1d(kernel_size=11, sigma=1.5):
    half = (kernel_size - 1) / 2
    coords = np.arange(kernel_size, dtype=np.float64) - half
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def _window_means(img, kernel_size=11, sigma=1.5):
    """Separable gaussian filtering with reflect padding, then crop the
    padded border (torchmetrics 0.6.2 _ssim_compute behaviour).  img is
    (..., H, W); output (..., H - 2*pad, W - 2*pad)."""
    from scipy.ndimage import correlate1d

    pad = (kernel_size - 1) // 2
    k = _gaussian_kernel_1d(kernel_size, sigma)
    out = correlate1d(img, k, axis=-1, mode="reflect")
    out = correlate1d(out, k, axis=-2, mode="reflect")
    return out[..., pad:-pad, pad:-pad]


def ssim(pred, target, data_range, kernel_size=11, sigma=1.5, k1=0.01,
         k2=0.03):
    """SSIM with torchmetrics-0.6.2 semantics; inputs (N, C, H, W)."""
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_p = _window_means(pred, kernel_size, sigma)
    mu_t = _window_means(target, kernel_size, sigma)
    mu_pp = _window_means(pred * pred, kernel_size, sigma)
    mu_tt = _window_means(target * target, kernel_size, sigma)
    mu_pt = _window_means(pred * target, kernel_size, sigma)
    sigma_p = mu_pp - mu_p**2
    sigma_t = mu_tt - mu_t**2
    sigma_pt = mu_pt - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * sigma_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (sigma_p + sigma_t + c2)
    return float(np.mean(num / den))


def psnr(pred, target, data_range):
    """Per-image PSNR, dims (C, H, W) per sample then batch mean
    (torchmetrics 0.6.2 with dim=(1,2,3), reduction elementwise_mean)."""
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    mse = np.mean((pred - target) ** 2, axis=(1, 2, 3))
    mse = np.maximum(mse, 1e-24)
    return float(np.mean(10.0 * np.log10(data_range**2 / mse)))


def l1(pred, target):
    return float(np.mean(np.abs(np.asarray(pred) - np.asarray(target))))


def compute_metrics(pred_img, target_img, min_target_val, max_target_val,
                    lpips_fn=None):
    """Per-sample metric set (metric.py:28-92).

    pred_img/target_img: (1/3, H, W) single sample (the evaluation loop
    iterates samples to bound memory, robust_e_nerf.py:681-696).
    """
    pred = np.asarray(pred_img)[None]  # (1, C, H, W)
    target = np.asarray(target_img)[None]
    assert pred.shape == target.shape and pred.ndim == 4
    assert 0 <= min_target_val < max_target_val

    target_range = max_target_val - min_target_val
    out = {
        "l1": l1(pred, target),
        "psnr": psnr(pred, target, target_range),
        "ssim": ssim(pred, target, max_target_val),
    }
    if lpips_fn is not None:
        # renormalize so target values land in [-1, 1]; grayscale -> 3ch
        pred_n = 2 * (pred - min_target_val) / target_range - 1
        target_n = 2 * (target - min_target_val) / target_range - 1
        if pred_n.shape[1] == 1:
            pred_n = np.repeat(pred_n, 3, axis=1)
            target_n = np.repeat(target_n, 3, axis=1)
        out["lpips"] = float(lpips_fn(pred_n, target_n))
    else:
        out["lpips"] = None
    return out
