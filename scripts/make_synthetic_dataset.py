#!/usr/bin/env python
"""Generate a synthetic event-camera dataset (see data/synthetic.py)."""

import argparse
import os
import sys

sys.path.insert(1, os.path.join(sys.path[0], ".."))

from robust_e_nerf_tpu.data import synthetic  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--img-size", type=int, default=64)
    parser.add_argument("--duration", type=float, default=4.0)
    parser.add_argument("--pose-samples", type=int, default=81)
    parser.add_argument("--sim-frames", type=int, default=401)
    parser.add_argument("--contrast-threshold", type=float, default=0.2)
    parser.add_argument("--p2n-ratio", type=float, default=1.0)
    parser.add_argument("--speed-wobble", type=float, default=0.0)
    parser.add_argument("--revolutions", type=float, default=1.0)
    parser.add_argument("--elevation-sweep", type=float, default=0.0)
    parser.add_argument("--fov", type=float, default=60.0,
                        help="horizontal field of view (deg)")
    parser.add_argument("--sphere-radius", type=float, default=1.0,
                        help="<1 leaves real empty space in the aabb "
                             "(sparse-workload lever validation)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    synthetic.generate_dataset(
        args.out_dir,
        img_width=args.img_size,
        img_height=args.img_size,
        duration_s=args.duration,
        num_pose_samples=args.pose_samples,
        num_sim_frames=args.sim_frames,
        contrast_threshold=args.contrast_threshold,
        p2n_ratio=args.p2n_ratio,
        speed_wobble=args.speed_wobble,
        revolutions=args.revolutions,
        elevation_sweep=args.elevation_sweep,
        fov_deg=args.fov,
        sphere_radius=args.sphere_radius,
        seed=args.seed,
    )
    print(f"dataset written to {args.out_dir}")


if __name__ == "__main__":
    main()
