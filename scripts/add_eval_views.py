#!/usr/bin/env python
"""Append extra ground-truth eval views to an existing synthetic dataset.

Round-4 VERDICT weak #2: every quality headline is scored on a 4-view
eval, where PSNR/SSIM saturate within ~200 steps and then measure only
overfit direction.  The eval poses cannot be widened in-place — the
generator draws them from the dataset's seeded rng stream, so changing
`num_val_views`/`num_test_views` would SHIFT the existing four poses and
break comparability with every committed metric.

This script instead appends N additional views per stage from an
INDEPENDENT rng (default seed 1), re-rendering with the same analytic
sphere renderer (`robust_e_nerf_tpu.data.synthetic.render_linear`) and
the intrinsics recorded in the dataset's own `camera_calibration.npz`.
The event stream, poses, and the original eval views are untouched:
existing frames keep their indices, new frames append after them, so a
re-run of `test` on the enlarged set scores the SAME model on a
superset of views.  Deterministic: same dataset + same seed + same N
give byte-identical PNGs and JSON.

Usage:
  python scripts/add_eval_views.py datasets/sphere-128 \
      --num 12 --stages val,test --seed 1 --elevation-sweep 1.0
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e_nerf_tpu.data import synthetic  # noqa: E402

try:
    import cv2
except ImportError:  # pragma: no cover - baked into the image
    cv2 = None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("--num", type=int, default=12,
                    help="views to append per stage")
    ap.add_argument("--stages", default="val,test")
    ap.add_argument("--seed", type=int, default=1,
                    help="independent rng seed (MUST differ from the "
                         "dataset generator's seed to avoid reusing "
                         "training-trajectory randomness)")
    ap.add_argument("--elevation-sweep", type=float, default=1.0,
                    help="same band as the generator: phi ~ U(-0.9s, 0.9s); "
                         "0 falls back to the legacy U(0.35, 0.75) band")
    ap.add_argument("--sphere-radius", type=float, default=1.0)
    args = ap.parse_args()

    calib = np.load(os.path.join(args.dataset, "camera_calibration.npz"))
    intrinsics = calib["intrinsics"]
    width = int(calib["img_width"])
    height = int(calib["img_height"])
    intrinsics_inv = np.linalg.inv(intrinsics)
    views_dir = os.path.join(args.dataset, "views")

    rng = np.random.default_rng(args.seed)
    for stage in args.stages.split(","):
        tpath = os.path.join(views_dir, f"transforms_{stage}.json")
        with open(tpath) as f:
            transforms = json.load(f)
        frames = transforms["frames"]
        start = len(frames)
        thetas = rng.uniform(0, 2 * np.pi, args.num)
        if args.elevation_sweep > 0.0:
            phis = rng.uniform(-0.9 * args.elevation_sweep,
                               0.9 * args.elevation_sweep, args.num)
        else:
            phis = rng.uniform(0.35, 0.75, args.num)
        for i in range(args.num):
            pos, rot = synthetic.orbit_pose(thetas[i], phi=phis[i])
            img, alpha = synthetic.render_linear(
                pos, rot, intrinsics_inv, width, height,
                sphere_radius=args.sphere_radius,
            )
            display = np.power(np.clip(img, 0.0, 1.0), 1.0 / synthetic.GAMMA)
            display_u8 = np.clip(
                np.round(display * 255.0), 0, 255
            ).astype(np.uint8)
            alpha_u8 = (alpha * 255).astype(np.uint8)
            bgra = np.stack(
                [display_u8 * (alpha_u8 > 0)] * 3 + [alpha_u8], axis=-1
            )
            name = f"{stage}_{start + i:03d}"
            cv2.imwrite(os.path.join(views_dir, name + ".png"), bgra)
            rot_gl = rot @ np.diag([1.0, -1.0, -1.0])
            t_wc = np.eye(4)
            t_wc[:3, :3] = rot_gl
            t_wc[:3, 3] = pos
            frames.append(
                {"file_path": name, "transform_matrix": t_wc.tolist()}
            )
        with open(tpath, "w") as f:
            json.dump(transforms, f)
        print(f"{stage}: {start} -> {len(frames)} views "
              f"(+{args.num}, seed {args.seed})")


if __name__ == "__main__":
    main()
