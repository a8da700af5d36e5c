"""PosedImage transform details: bit depth, alpha compositing spaces,
color conversions (datasets.py:532-659)."""

import json
import os

import cv2
import numpy as np
import pytest

from robust_e_nerf_tpu.data import posed_images


def make_dataset(tmp_path, img, bit_depth=None, renderer=None,
                 bayer_pattern=""):
    views = tmp_path / "views"
    views.mkdir(exist_ok=True)
    cv2.imwrite(str(views / "img0.png"), img)
    transforms = {
        "camera_angle_x": 1.0,
        "frames": [{
            "file_path": "img0",
            "transform_matrix": np.eye(4).tolist(),
        }],
    }
    if bit_depth is not None:
        transforms["bit_depth"] = bit_depth
    with open(views / "transforms_val.json", "w") as f:
        json.dump(transforms, f)
    np.savez(
        tmp_path / "camera_calibration.npz",
        img_height=np.int64(img.shape[0]), img_width=np.int64(img.shape[1]),
        distortion_model="none", distortion_params=np.zeros(0),
        intrinsics=np.eye(3), bayer_pattern=bayer_pattern,
        pos_contrast_threshold=np.float64(0.2),
        neg_contrast_threshold=np.float64(0.2),
        refractory_period=np.int64(0),
    )
    if renderer is not None:
        np.savez(tmp_path / "renderer_params.npz", **renderer)
    return str(tmp_path)


def test_adc_normalization_8bit(tmp_path, rng):
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    root = make_dataset(tmp_path, img)
    out = posed_images.load_posed_images(root, "val", None, False)
    # y' = (x + 0.5) / 256 (datasets.py:629-647)
    np.testing.assert_allclose(
        out["img"][0], (img.astype(np.float32) + 0.5) / 256, atol=1e-6
    )
    assert out["min_normalized_pixel_value"] == pytest.approx(0.5 / 256)
    assert out["max_normalized_pixel_value"] == pytest.approx(1 - 0.5 / 256)


def test_explicit_bit_depth(tmp_path, rng):
    # a 12-bit sensor stored in uint16: quantization levels = 2^12
    img = rng.integers(0, 4096, (8, 8), dtype=np.uint16)
    root = make_dataset(tmp_path, img, bit_depth=12)
    out = posed_images.load_posed_images(root, "val", None, False)
    np.testing.assert_allclose(
        out["img"][0], (img.astype(np.float32) + 0.5) / 4096, atol=1e-6
    )
    assert out["min_normalized_pixel_value"] == pytest.approx(0.5 / 4096)


def test_alpha_over_white_display_space(tmp_path):
    # BGRA, display space: straight alpha over white (datasets.py:593-600)
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., :3] = 100
    img[..., 3] = 128
    root = make_dataset(
        tmp_path, img,
        renderer={"interm_color_space": "display", "log_eps": 1e-3},
    )
    out = posed_images.load_posed_images(root, "val", None, True)
    alpha = 128 / 255
    expected_gray = alpha * 100 + (1 - alpha) * 255
    expected = (expected_gray + 0.5) / 256
    np.testing.assert_allclose(out["img"][0], expected, atol=1e-3)


def test_alpha_channel_dropped_without_compositing(tmp_path):
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 0] = 200  # blue channel
    img[..., 3] = 255
    root = make_dataset(
        tmp_path, img,
        renderer={"interm_color_space": "display", "log_eps": 1e-3},
    )
    out = posed_images.load_posed_images(root, "val", None, False)
    # BGR->gray of pure blue = 0.114 * 200
    expected = (0.114 * 200 + 0.5) / 256
    np.testing.assert_allclose(out["img"][0], expected, atol=2e-3)


def test_bayer_images_stay_rgb(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 2] = 210  # red in BGR
    root = make_dataset(tmp_path, img, bayer_pattern="RGGB")
    out = posed_images.load_posed_images(root, "val", None, False)
    assert out["img"].shape == (1, 3, 4, 4)  # (N, RGB, H, W)
    np.testing.assert_allclose(
        out["img"][0, 0], (210 + 0.5) / 256, atol=1e-6
    )
    np.testing.assert_allclose(out["img"][0, 1], 0.5 / 256, atol=1e-6)
