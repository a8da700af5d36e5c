#!/usr/bin/env python
"""Extract the event-camera calibration trajectory from a run's
TensorBoard events into a committable diagnostic file.

The joint-calibration config family (reference
configs/train/mocap-desk2.yaml:31-36 — C_p and tau unfrozen) logs
`train/p2n_contrast_threshold_ratio` and `train/refractory_period` as
TB scalars only (engine/trainer.py:473-480); the babysitter's stdout
log never sees them.  This script reads every events file in the run's
log dir and writes a step-keyed table to
docs/diagnostics/<tag>_calibration.txt so the recovered calibration is
durable evidence (the driver machine is recreated between sessions).

For the checked-in synthetic scenes the generator ground truth is
p2n_ratio = 1.0 and refractory_period = 0 s (BASELINE.md recipe), so a
correct joint run should hold ratio ~= 1 and tau ~= 0 while quality
matches the frozen-calibration run.

Usage:
  python scripts/collect_calibration_trajectory.py <run_log_dir> <tag>
"""

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAGS = ("train/p2n_contrast_threshold_ratio", "train/refractory_period")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_log_dir")
    ap.add_argument("tag")
    args = ap.parse_args()

    from tensorboard.backend.event_processing import event_accumulator

    by_step = {}  # step -> {tag: value}; later events files win
    files = sorted(glob.glob(os.path.join(args.run_log_dir, "events*")))
    if not files:
        print(f"no events files under {args.run_log_dir}", file=sys.stderr)
        sys.exit(1)
    for f in files:
        ea = event_accumulator.EventAccumulator(
            f, size_guidance={"scalars": 0})
        ea.Reload()
        tags = ea.Tags()["scalars"]
        for tag in TAGS:
            if tag not in tags:
                continue
            for ev in ea.Scalars(tag):
                by_step.setdefault(ev.step, {})[tag] = ev.value
    if not by_step:
        print("no calibration scalars found — run has frozen C_p/tau "
              "or has not logged yet", file=sys.stderr)
        sys.exit(1)

    out = os.path.join(REPO, "docs", "diagnostics",
                       f"{args.tag}_calibration.txt")
    # merge with previously collected steps (babysitter restarts rotate
    # events files; keep the union, newest value per step)
    prev = {}
    if os.path.isfile(out):
        with open(out) as f:
            for ln in f:
                if ln.startswith("step"):
                    continue
                parts = ln.split()
                if len(parts) == 3:
                    prev[int(parts[0])] = {
                        TAGS[0]: float(parts[1]),
                        TAGS[1]: float(parts[2]),
                    }
    prev.update(by_step)
    with open(out, "w") as f:
        f.write("step p2n_contrast_threshold_ratio refractory_period_s\n")
        for step in sorted(prev):
            row = prev[step]
            f.write(f"{step} {row.get(TAGS[0], float('nan')):.8f} "
                    f"{row.get(TAGS[1], float('nan')):.3e}\n")
    last = prev[max(prev)]
    print(f"wrote {len(prev)} steps -> {out}; latest: "
          f"ratio={last.get(TAGS[0]):.6f} tau={last.get(TAGS[1]):.3e}s "
          f"(ground truth: ratio=1.0 tau=0)")


if __name__ == "__main__":
    main()
