"""Posed evaluation images (host side).

Counterpart of `data/datasets.py:376-690` (class PosedImage): NeRF-blender
`views/transforms_{stage}.json` + image files, with

  * intrinsics from `camera_angle_x` (principal point at W/2-0.5, H/2-0.5)
    or an explicit matrix (datasets.py:513-528);
  * optional alpha-over-white compositing in display (straight alpha) or
    linear (premultiplied) space (datasets.py:593-606);
  * BGR->RGB for Bayer sensors / BGR->Gray for monochrome
    (datasets.py:613-627);
  * ADC half-LSB normalization of quantized images to
    [0.5/2^D, 1 - 0.5/2^D], or +log_eps for linear float renders
    (datasets.py:629-653);
  * OpenGL -> common camera-frame orientation (datasets.py:378-382,661-673).
"""

from __future__ import annotations

import glob
import json
import math
import os

import cv2
import numpy as np

from . import events as events_mod

STAGES = ("train", "val", "test")
POSED_IMG_FOLDER_NAME = "views"
RENDERER_PARAMS_FILENAME = "renderer_params.npz"

# x right, y up, z backwards  ->  x right, y down, z forwards
T_COPENGL_CCOMMON = np.array(
    [[1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=np.float64
)


def posed_img_folder_path(root_directory):
    """views/ lives in the dataset root or one level above it
    (datasets.py:433-442)."""
    for candidate in (
        os.path.join(root_directory, POSED_IMG_FOLDER_NAME),
        os.path.join(root_directory, "..", POSED_IMG_FOLDER_NAME),
    ):
        if os.path.isdir(candidate):
            return candidate
    raise FileNotFoundError(
        f"no '{POSED_IMG_FOLDER_NAME}' folder near {root_directory}"
    )


def load_stage_transforms(root_directory, stage):
    path = os.path.join(
        posed_img_folder_path(root_directory), f"transforms_{stage}.json"
    )
    with open(path) as f:
        return json.load(f)


def load_renderer_params(root_directory):
    path = os.path.join(root_directory, RENDERER_PARAMS_FILENAME)
    if os.path.isfile(path):
        return np.load(path)
    return None


def load_posed_images(root_directory, stage, permutation_seed=None,
                      alpha_over_white_bg=False):
    """Returns a dict:
      sample_id: list[str]
      img: (N, [3,] H, W) float32 normalized intensities
      T_wc_position: (N, 3) f32; T_wc_orientation: (N, 3, 3) f32
      intrinsics: (3, 3) f32
      min/max_normalized_pixel_value: floats
    """
    assert stage in STAGES
    stage_transforms = load_stage_transforms(root_directory, stage)
    renderer_params = load_renderer_params(root_directory)
    calibration = events_mod.load_camera_calibration(root_directory)

    folder = posed_img_folder_path(root_directory)
    sample_ids, imgs, positions, orientations = [], [], [], []
    for frame in stage_transforms["frames"]:
        sample_ids.append(os.path.basename(frame["file_path"]))
        matches = glob.glob(
            os.path.join(folder, frame["file_path"] + ".*")
        )
        img = cv2.imread(matches[0], cv2.IMREAD_UNCHANGED)
        imgs.append(img)
        t_wc = np.asarray(frame["transform_matrix"], dtype=np.float64)
        positions.append(t_wc[:3, 3])
        orientations.append(t_wc[:3, :3])

    img = np.stack(imgs, axis=0)
    position = np.stack(positions, axis=0)
    orientation = np.stack(orientations, axis=0)

    # intrinsics (datasets.py:513-528)
    if "camera_angle_x" in stage_transforms:
        height, width = img.shape[1:3]
        focal = (width / 2) / math.tan(stage_transforms["camera_angle_x"] / 2)
        intrinsics = np.array(
            [[focal, 0, width / 2 - 0.5],
             [0, focal, height / 2 - 0.5],
             [0, 0, 1]],
            dtype=np.float64,
        )
    else:
        intrinsics = np.asarray(stage_transforms["intrinsics"],
                                dtype=np.float64)

    img, min_val, max_val = transform_images(
        img, alpha_over_white_bg, stage_transforms, renderer_params,
        calibration,
    )
    orientation = orientation @ T_COPENGL_CCOMMON

    out = {
        "sample_id": sample_ids,
        "img": img.astype(np.float32),
        "T_wc_position": position.astype(np.float32),
        "T_wc_orientation": orientation.astype(np.float32),
        "intrinsics": intrinsics.astype(np.float32),
        "min_normalized_pixel_value": float(min_val),
        "max_normalized_pixel_value": float(max_val),
    }
    if permutation_seed is not None:
        from ..utils import tensor_ops

        perm = tensor_ops.randperm_manual_seed(len(sample_ids),
                                               permutation_seed)
        out["sample_id"] = [sample_ids[i] for i in perm]
        for key in ("img", "T_wc_position", "T_wc_orientation"):
            out[key] = out[key][perm]
    return out


def transform_images(img, alpha_over_white_bg, stage_transforms,
                     renderer_params, camera_calibration):
    """Image normalization pipeline (datasets.py:532-659).

    Returns (img (N, [3,] H, W) float, min_normalized, max_normalized).
    """
    is_quantized = np.issubdtype(img.dtype, np.unsignedinteger)
    is_synthetic = renderer_params is not None
    num_channels = 1 if img.ndim == 3 else img.shape[3]
    bayer_pattern = events_mod.bayer_pattern_of(camera_calibration)

    if is_quantized:
        if "bit_depth" in stage_transforms:
            num_levels = 2 ** stage_transforms["bit_depth"]
        else:
            num_levels = np.iinfo(img.dtype).max + 1
    if is_synthetic:
        interm_color_space = str(renderer_params["interm_color_space"])

    assert np.issubdtype(img.dtype, np.unsignedinteger) or np.issubdtype(
        img.dtype, np.floating
    )
    assert np.all(img >= 0)
    if is_synthetic:
        assert interm_color_space == ("display" if is_quantized else "linear")
    else:
        assert is_quantized
    assert num_channels in (1, 3, 4)
    if num_channels == 4:
        assert is_synthetic

    if alpha_over_white_bg and num_channels == 4:
        if interm_color_space == "display":
            alpha = img[..., 3:4] / (num_levels - 1)
            img = alpha * img[..., :3] + (1 - alpha) * (num_levels - 1)
        else:  # linear: premultiplied alpha
            alpha = img[..., 3:4]
            img = img[..., :3] + (1 - alpha)
    elif num_channels == 4:
        img = img[..., :3]

    img = img.astype(np.float32)

    if bayer_pattern != events_mod.NULL_BAYER_PATTERN:
        img = np.stack(
            [cv2.cvtColor(sample, cv2.COLOR_BGR2RGB) for sample in img],
            axis=0,
        ).transpose(0, 3, 1, 2)  # (N, 3, H, W) RGB
    elif img.ndim == 4 and img.shape[3] == 3:
        img = np.stack(
            [cv2.cvtColor(sample, cv2.COLOR_BGR2GRAY) for sample in img],
            axis=0,
        )  # (N, H, W)

    if is_quantized:
        min_val = 0.5 / num_levels
        img = img / num_levels + min_val
        max_val = 1 - min_val
    else:
        min_val = float(renderer_params["log_eps"])
        img = img + min_val
        max_val = float(img.max())

    return img, min_val, max_val
