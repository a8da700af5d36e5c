"""LPIPS perceptual metric (gated).

The reference uses the `lpips` package's pretrained AlexNet
(loss_metric/metric.py:18,90).  Pretrained weights cannot be downloaded in
an air-gapped environment, so LPIPS is computed only when a converted
weights file is available:

  1. `$LPIPS_WEIGHTS_NPZ` (or `lpips_<net>.npz` next to this file) holds the
     converted backbone + linear-head weights — `scripts/convert_lpips.py`
     produces it from a torch `lpips` installation; then a pure-JAX AlexNet
     feature distance runs here;
  2. else, if the torch `lpips` package happens to be importable, it is
     used directly on the host;
  3. else `get_lpips_fn` returns None and the metric reports null
     (engine/trainer.py handles the None).
"""

from __future__ import annotations

import functools
import os

import numpy as np

_ALEX_CONVS = (  # (out_ch, kernel, stride, pad) of torchvision AlexNet
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# feature taps after each ReLU, with 3x2 max-pools between stages 0-1, 1-2
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1)


def _weights_path(net):
    env = os.environ.get("LPIPS_WEIGHTS_NPZ")
    if env and os.path.isfile(env):
        return env
    local = os.path.join(os.path.dirname(__file__), f"lpips_{net}.npz")
    if os.path.isfile(local):
        return local
    return None


@functools.lru_cache(maxsize=2)
def get_lpips_fn(net="alex"):
    """Returns fn(pred (N,3,H,W) in [-1,1], target) -> mean distance, or
    None when no weights are available."""
    path = _weights_path(net)
    if path is not None and net == "alex":
        weights = dict(np.load(path))
        return functools.partial(_lpips_alex_jax, weights)
    try:  # torch lpips fallback (not installed in this image)
        import lpips as torch_lpips  # noqa: F401
        import torch

        model = torch_lpips.LPIPS(net=net)
        model.eval()

        def torch_fn(pred, target):
            with torch.no_grad():
                return float(
                    model(
                        torch.from_numpy(np.asarray(pred, np.float32)),
                        torch.from_numpy(np.asarray(target, np.float32)),
                    ).mean()
                )

        return torch_fn
    except ImportError:
        return None


def _lpips_alex_jax(weights, pred, target):
    import jax.numpy as jnp
    from jax import lax

    def normalize_input(x):
        return (jnp.asarray(x, jnp.float32) - _SHIFT) / _SCALE

    def features(x):
        feats = []
        for i, (out_ch, k, stride, pad) in enumerate(_ALEX_CONVS):
            w = jnp.asarray(weights[f"conv{i}_w"])  # (out, in, k, k)
            b = jnp.asarray(weights[f"conv{i}_b"])
            x = lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]
            x = jnp.maximum(x, 0.0)
            feats.append(x)
            if i in (0, 1):
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                    "VALID",
                )
            del out_ch, k
        return feats

    fp = features(normalize_input(pred))
    ft = features(normalize_input(target))
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        # lpips 0.1.4 normalize_tensor: x / (sqrt(sum x^2) + eps) — the
        # eps sits OUTSIDE the sqrt
        a = a / (jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True)) + 1e-10)
        diff = (a - b) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        # 1x1 conv to a scalar map, then spatial mean (lpips.py semantics)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return float(total)
