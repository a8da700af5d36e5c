#!/usr/bin/env python
"""Collect committable evidence from a quality run's log directory.

The driver machine is recreated between sessions, so anything not in git
is lost: trained checkpoints (which bench.py's `:steady` entries restore
from) and val trajectories (the quality evidence VERDICT.md audits) must
be copied into tracked paths and committed.

Given a run's stdout log (the babysitter's /tmp/babysit_train_<tag>.log
or any file with the trainer's `epoch N val/...` lines) and its log dir,
this script:
  1. extracts the per-epoch val metric lines into
     docs/diagnostics/<tag>_val_trajectory.txt (appending new epochs on
     re-runs, so it can be invoked repeatedly while the run progresses);
  2. copies the best retained checkpoint (checkpoints/best.json ranking,
     engine/trainer.py) to logs/train/<dest>.npz — the path bench.py's
     steady entries default to (bench.py STEADY_CONFIGS).

Usage:
  python scripts/collect_run_evidence.py <stdout_log> <run_log_dir> <tag>
      [--dest logs/train/ngp-64-best.npz]
"""

import argparse
import json
import os
import re
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VAL_LINE = re.compile(r"^epoch \d+ val/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stdout_log")
    ap.add_argument("run_log_dir")
    ap.add_argument("tag")
    ap.add_argument("--dest", default=None,
                    help="tracked checkpoint path (default "
                         "logs/train/<tag>-best.npz)")
    args = ap.parse_args()

    traj_path = os.path.join(REPO, "docs", "diagnostics",
                             f"{args.tag}_val_trajectory.txt")
    lines = []
    with open(args.stdout_log) as f:
        for line in f:
            if VAL_LINE.match(line):
                lines.append(line.rstrip("\n"))
    # keep the LAST occurrence per epoch (babysitter restarts re-validate)
    by_epoch = {}
    for ln in lines:
        by_epoch[int(ln.split()[1])] = ln
    with open(traj_path, "w") as f:
        for ep in sorted(by_epoch):
            f.write(by_epoch[ep] + "\n")
    print(f"wrote {len(by_epoch)} epochs -> {traj_path}")

    best_meta = os.path.join(args.run_log_dir, "checkpoints", "best.json")
    if not os.path.isfile(best_meta):
        print(f"no {best_meta}; skipping checkpoint copy")
        return
    with open(best_meta) as f:
        meta = json.load(f)
    src = meta.get("best_model_path")
    if not src or not os.path.isfile(src):
        print(f"best_model_path missing in {best_meta}")
        return
    dest = args.dest or os.path.join("logs", "train",
                                     f"{args.tag}-best.npz")
    dest = os.path.join(REPO, dest)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(src, dest)
    score = [r.get("score") for r in meta.get("records", [])
             if r.get("path") == src]
    print(f"copied best ({meta.get('monitor')}={score[0] if score else '?'}"
          f") {src} -> {dest} "
          f"({os.path.getsize(dest) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
