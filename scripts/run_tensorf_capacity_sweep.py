#!/usr/bin/env python
"""tensorf capacity sweep (round-5 VERDICT #4).

Round 4 called the tensorf 16.1-PSNR plateau "arch-intrinsic" from a
single loss-function probe; the capacity knobs were never touched —
`vm_grid: {n_components: 16, resolution: 512}` in every run, while
TensoRF-class models conventionally need 32-48 components for fine
texture (the capacity-per-quality trade the reference's parity arch
sets, /root/reference/robust_e_nerf/external/ngp.py:109-205).

This driver A/Bs n_components x resolution for a few epochs each at the
2^20 budget on a chosen dataset, reusing the round-4 full-regime recipe
(configs/train/tpu-sphere-full.yaml) with the LR decays pushed past the
probe horizon.  Each probe trains fresh (seed 0) and reports its last
val metrics; results append to a TSV for docs/PERFORMANCE.md.

Usage:
  python scripts/run_tensorf_capacity_sweep.py \
      [--dataset datasets/sphere] [--epochs 3] \
      [--grid 16:512,32:512,48:512,16:800,32:800] \
      [--out docs/diagnostics/r5_tensorf_capacity_sweep.tsv]
"""

import argparse
import os
import re
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAL_LINE = re.compile(
    r"^epoch (\d+)(?: step \d+)? (val/.*)$"
)


def build_cfg(base, dataset, n_comp, res, epochs, tag):
    cfg = yaml.safe_load(open(base))
    cfg["data"]["dataset_directory"] = dataset
    vm = cfg["model"]["nerf"]["tensorf"]["vm_grid"]
    vm["n_components"] = n_comp
    vm["resolution"] = res
    # line_resolution tracks the plane resolution like the reference's
    # single TensoRF `resolution` knob
    vm["line_resolution"] = res
    cfg["trainer"]["max_epochs"] = epochs
    cfg["trainer"]["limit_train_batches"] = 200
    # decays never fire inside the probe horizon: capacity is measured
    # at the full base LR for every cell
    cfg["lr_scheduler"]["multi_step_lr"]["milestones"] = [10 * epochs]
    cfg["logger"]["name"] = f"train/{tag}"
    cfg["logger"]["version"] = 0
    cfg["checkpoint"]["save_top_k"] = 1
    cfg["checkpoint"]["save_last"] = False
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="datasets/sphere")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--grid",
                    default="16:512,32:512,48:512,16:800,32:800")
    ap.add_argument("--out",
                    default="docs/diagnostics/"
                            "r5_tensorf_capacity_sweep.tsv")
    ap.add_argument("--base",
                    default="configs/train/tpu-sphere-full.yaml")
    args = ap.parse_args()

    cells = []
    for cell in args.grid.split(","):
        n_comp, res = cell.split(":")
        cells.append((int(n_comp), int(res)))

    out_path = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if not os.path.exists(out_path):
        with open(out_path, "w") as f:
            f.write("# tensorf capacity sweep: dataset=%s epochs/cell=%d "
                    "(200-step epochs, 2^20 budget, no LR decay)\n"
                    "n_components\tresolution\tsteps_per_sec\t"
                    "last_val_psnr\tlast_val_ssim\tval_trajectory\n"
                    % (args.dataset, args.epochs))

    for n_comp, res in cells:
        tag = f"tensorf-sweep-c{n_comp}-r{res}"
        cfg = build_cfg(os.path.join(REPO, args.base), args.dataset,
                        n_comp, res, args.epochs, tag)
        cfg_path = f"/tmp/sweep_{tag}.yaml"
        yaml.safe_dump(cfg, open(cfg_path, "w"), sort_keys=False)
        print(f"=== {tag} ===", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "run.py"),
             "train", cfg_path],
            capture_output=True, text=True, cwd=REPO,
        )
        elapsed = time.time() - t0
        traj, steps_per_sec = [], None
        for line in proc.stdout.splitlines():
            m = VAL_LINE.match(line)
            if m:
                traj.append((int(m.group(1)), m.group(2)))
            sm = re.search(r"\(([\d.]+) steps/s\)", line)
            if sm:
                steps_per_sec = float(sm.group(1))
        if proc.returncode != 0:
            print(proc.stdout[-3000:], file=sys.stderr)
            print(proc.stderr[-3000:], file=sys.stderr)
            row = (f"{n_comp}\t{res}\tFAILED rc={proc.returncode} "
                   f"after {elapsed:.0f}s\t\t\t\n")
        else:
            def metric(s, key):
                m = re.search(rf"{key}=([\d.]+)", s)
                return m.group(1) if m else ""
            last = traj[-1][1] if traj else ""
            row = "\t".join([
                str(n_comp), str(res),
                f"{steps_per_sec}" if steps_per_sec else "",
                metric(last, "val/psnr"), metric(last, "val/ssim"),
                "; ".join(f"ep{e}:{metric(s, 'val/psnr')}"
                          for e, s in traj),
            ]) + "\n"
        with open(out_path, "a") as f:
            f.write(row)
        print(row, end="", flush=True)


if __name__ == "__main__":
    main()
