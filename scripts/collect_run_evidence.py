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
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from robust_e_nerf_tpu.engine.checkpoint import resolve_checkpoint_path  # noqa: E402

VAL_LINE = re.compile(r"^epoch \d+ val/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stdout_log")
    ap.add_argument("run_log_dir")
    ap.add_argument("tag")
    ap.add_argument("--dest", default=None,
                    help="tracked checkpoint path (default "
                         "logs/train/<tag>-best.npz)")
    ap.add_argument("--merge", action="store_true",
                    help="keep ALL previously collected epochs, even ones "
                         ">= the new log's first epoch (default keeps only "
                         "epochs strictly below it — the resume case — so "
                         "a from-scratch rerun under the same tag cannot "
                         "inherit epochs it never produced)")
    args = ap.parse_args()

    traj_path = os.path.join(REPO, "docs", "diagnostics",
                             f"{args.tag}_val_trajectory.txt")
    lines = []
    with open(args.stdout_log) as f:
        for line in f:
            if VAL_LINE.match(line):
                lines.append(line.rstrip("\n"))
    if not lines:
        print(f"WARNING: no `epoch N val/...` lines in {args.stdout_log} "
              "- wrong log file, or the run has not validated yet",
              file=sys.stderr)
    # merge with previously collected epochs: after a machine recreation
    # or log rotation, a resumed run's stdout log only contains LATER
    # epochs, and rebuilding from it alone would drop committed history.
    # Only epochs strictly BELOW the new log's first epoch are inherited
    # (the resume case) — a from-scratch rerun under the same tag must
    # not silently report trailing epochs the current run never reached
    # (pass --merge to keep everything, e.g. interleaved partial logs).
    new_min = min((int(ln.split()[1]) for ln in lines), default=None)
    by_epoch = {}
    if os.path.isfile(traj_path):
        with open(traj_path) as f:
            for ln in f:
                ln = ln.rstrip("\n")
                if VAL_LINE.match(ln):
                    ep = int(ln.split()[1])
                    if args.merge or new_min is None or ep < new_min:
                        by_epoch[ep] = ln
    # keep the LAST occurrence per epoch (babysitter restarts re-validate)
    for ln in lines:
        by_epoch[int(ln.split()[1])] = ln
    with open(traj_path, "w") as f:
        for ep in sorted(by_epoch):
            f.write(by_epoch[ep] + "\n")
    print(f"wrote {len(by_epoch)} epochs ({len(lines)} val lines in log) "
          f"-> {traj_path}")

    best_meta = os.path.join(args.run_log_dir, "checkpoints", "best.json")
    if not os.path.isfile(best_meta):
        print(f"no {best_meta}; skipping checkpoint copy")
        return
    with open(best_meta) as f:
        meta = json.load(f)
    src = meta.get("best_model_path")
    if src and not os.path.isfile(src):
        # best_model_path may be stored cwd-relative; resolve it the same
        # way the trainer does (retry next to the sidecar)
        try:
            src = resolve_checkpoint_path(best_meta)
        except FileNotFoundError:
            pass
    if not src or not os.path.isfile(src):
        print(f"best_model_path unresolvable in {best_meta}")
        return
    dest = args.dest or os.path.join("logs", "train",
                                     f"{args.tag}-best.npz")
    dest = os.path.join(REPO, dest)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(src, dest)
    score = [r.get("score") for r in meta.get("records", [])
             if os.path.basename(r.get("path", "")) == os.path.basename(src)]
    print(f"copied best ({meta.get('monitor')}={score[0] if score else '?'}"
          f") {src} -> {dest} "
          f"({os.path.getsize(dest) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
