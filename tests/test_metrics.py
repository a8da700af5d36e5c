"""Metrics vs independent oracles (torch for SSIM conv arithmetic)."""

import numpy as np
import pytest

from robust_e_nerf_tpu.loss_metric import alignment, metric


def test_psnr_known_value():
    pred = np.zeros((1, 1, 16, 16))
    target = np.full((1, 1, 16, 16), 0.5)
    # mse = 0.25, data_range = 1 -> psnr = 10*log10(1/0.25)
    assert metric.psnr(pred, target, 1.0) == pytest.approx(
        10 * np.log10(4.0)
    )


def test_psnr_per_image_then_mean():
    rng = np.random.default_rng(0)
    a = rng.random((3, 1, 8, 8))
    b = rng.random((3, 1, 8, 8))
    per_img = [
        10 * np.log10(1.0 / np.mean((a[i] - b[i]) ** 2)) for i in range(3)
    ]
    assert metric.psnr(a, b, 1.0) == pytest.approx(np.mean(per_img))


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    img = rng.random((1, 1, 32, 32))
    assert metric.ssim(img, img, 1.0) == pytest.approx(1.0, abs=1e-9)


def test_ssim_matches_torch_conv_oracle():
    """Independent torch implementation of the same spec: 11x11 gaussian,
    reflect pad, border crop, both-channel mean."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    pred = rng.random((2, 3, 24, 24)).astype(np.float64)
    target = np.clip(
        pred + 0.1 * rng.standard_normal(pred.shape), 0, 1
    )
    data_range = 1.0

    k1d = metric._gaussian_kernel_1d(11, 1.5)
    kern = np.outer(k1d, k1d)
    kernel = torch.tensor(kern, dtype=torch.float64)
    kernel = kernel.expand(3, 1, 11, 11)

    def filt(x):
        x = torch.tensor(x, dtype=torch.float64)
        x = F.pad(x, (5, 5, 5, 5), mode="reflect")
        return F.conv2d(x, kernel, groups=3).numpy()[..., 5:-5, 5:-5]

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mp, mt = filt(pred), filt(target)
    spp = filt(pred * pred) - mp**2
    stt = filt(target * target) - mt**2
    spt = filt(pred * target) - mp * mt
    expected = np.mean(
        ((2 * mp * mt + c1) * (2 * spt + c2))
        / ((mp**2 + mt**2 + c1) * (spp + stt + c2))
    )
    ours = metric.ssim(pred, target, data_range)
    assert ours == pytest.approx(expected, rel=1e-8)


def test_affine_alignment_recovers_scale_offset():
    rng = np.random.default_rng(3)
    target_log = rng.standard_normal((2, 1, 16, 16))
    scale, offset = 0.4545, -1.234  # e.g. a gamma + exposure mismatch
    pred_log = (target_log - offset) / scale
    aligned, params = alignment.align_log_intensities(pred_log, target_log)
    np.testing.assert_allclose(aligned, target_log, atol=1e-10)
    assert params[0][0] == pytest.approx(scale, rel=1e-9)
    assert params[0][1] == pytest.approx(offset, rel=1e-6)


def test_affine_alignment_per_channel():
    rng = np.random.default_rng(4)
    target_log = rng.standard_normal((1, 3, 8, 8))
    pred_log = np.stack(
        [target_log[:, 0] * 2.0, target_log[:, 1] + 1.0,
         target_log[:, 2] * 0.5 - 3.0],
        axis=1,
    )
    aligned, _ = alignment.align_log_intensities(pred_log, target_log)
    np.testing.assert_allclose(aligned, target_log, atol=1e-9)


def test_compute_metrics_shapes_and_lpips_gate():
    rng = np.random.default_rng(5)
    target = rng.uniform(0.1, 0.9, (1, 16, 16))
    pred = np.clip(target + 0.01 * rng.standard_normal(target.shape),
                   0.05, 0.95)
    out = metric.compute_metrics(pred, target, 0.001, 1.0, lpips_fn=None)
    assert set(out) == set(metric.METRIC_NAMES)
    assert out["lpips"] is None
    assert out["psnr"] > 25
    assert 0 < out["ssim"] <= 1


def test_lpips_jax_matches_torch_mirror(tmp_path, rng):
    """The pure-JAX LPIPS must reproduce lpips-0.1.4's math exactly.

    Real pretrained weights are unobtainable in this air-gapped image
    (BASELINE.md), so the implementation is validated against a torch
    mirror of the lpips 0.1.4 forward (scaling layer -> AlexNet feature
    taps after each ReLU with 3x2 maxpools before convs 2/3 -> unit-
    normalize with eps outside the sqrt -> squared diff -> 1x1 linear ->
    spatial mean -> sum over layers) using RANDOM weights in the
    scripts/convert_lpips.py npz format.  With converted real weights the
    same code path reports the reference metric.
    """
    import torch
    import torch.nn.functional as F

    from robust_e_nerf_tpu.loss_metric import lpips_jax

    gen = torch.Generator().manual_seed(5)
    convs = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
             (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    weights = {}
    for i, (cin, cout, k, _s, _p) in enumerate(convs):
        weights[f"conv{i}_w"] = (
            0.1 * torch.randn(cout, cin, k, k, generator=gen)
        ).numpy()
        weights[f"conv{i}_b"] = (
            0.1 * torch.randn(cout, generator=gen)
        ).numpy()
        weights[f"lin{i}_w"] = torch.rand(
            1, cout, 1, 1, generator=gen
        ).numpy()
    npz = tmp_path / "lpips_alex.npz"
    np.savez(npz, **weights)

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def torch_lpips(x, y):
        def feats(z):
            z = (z - shift) / scale
            out = []
            for i, (cin, cout, k, s, p) in enumerate(convs):
                z = F.conv2d(
                    z, torch.from_numpy(weights[f"conv{i}_w"]),
                    torch.from_numpy(weights[f"conv{i}_b"]),
                    stride=s, padding=p,
                )
                z = F.relu(z)
                out.append(z)
                if i in (0, 1):
                    z = F.max_pool2d(z, kernel_size=3, stride=2)
            return out

        fx, fy = feats(x), feats(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (a - b) ** 2
            lin = torch.from_numpy(weights[f"lin{i}_w"])
            val = F.conv2d(diff, lin)          # (N, 1, H, W)
            total = total + val.mean(dim=(2, 3))  # spatial average
        return float(total.mean())

    pred = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    target = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    expected = torch_lpips(torch.from_numpy(pred),
                           torch.from_numpy(target))
    got = lpips_jax._lpips_alex_jax(
        {k: np.asarray(v) for k, v in weights.items()}, pred, target
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4)

    # and the weights-file gate resolves to the JAX path
    import os as _os

    _os.environ["LPIPS_WEIGHTS_NPZ"] = str(npz)
    try:
        lpips_jax.get_lpips_fn.cache_clear()
        fn = lpips_jax.get_lpips_fn("alex")
        assert fn is not None
        np.testing.assert_allclose(fn(pred, target), expected, rtol=2e-4)
    finally:
        del _os.environ["LPIPS_WEIGHTS_NPZ"]
        lpips_jax.get_lpips_fn.cache_clear()
