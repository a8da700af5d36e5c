#!/usr/bin/env python
"""Resilient long-run launcher: restart training from the latest
checkpoint when the process dies or its log stalls.

The axon device tunnel is observed to stall under sustained dispatch
(~2x/hour, docs/ROADMAP.md round-1 #5); training checkpoints every epoch,
so a watchdog that kills a stalled run and relaunches with
`trainer.resume_from_checkpoint` loses at most one epoch.

Usage: python scripts/babysit_train.py <config.yaml> [stall_timeout_s]
"""

import glob
import os
import signal
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_checkpoint(log_dir):
    paths = glob.glob(os.path.join(log_dir, "checkpoints", "*.npz"))
    if not paths:
        return None
    return max(paths, key=os.path.getmtime)


def main():
    config_path = sys.argv[1]
    stall_timeout = int(sys.argv[2]) if len(sys.argv) > 2 else 900

    with open(config_path) as f:
        base_cfg = yaml.safe_load(f)
    # pin the version so restarts land in the same log dir
    if base_cfg["logger"].get("version") is None:
        base_cfg["logger"]["version"] = 0
    log_dir = os.path.join(
        base_cfg["logger"]["save_dir"], base_cfg["logger"]["name"],
        f"version_{base_cfg['logger']['version']}",
    )

    attempt = 0
    while True:
        attempt += 1
        cfg = dict(base_cfg)
        ckpt = latest_checkpoint(log_dir)
        if ckpt:
            cfg["trainer"] = dict(cfg["trainer"])
            cfg["trainer"]["resume_from_checkpoint"] = ckpt
            print(f"[babysit] attempt {attempt}: resuming from {ckpt}",
                  flush=True)
        else:
            print(f"[babysit] attempt {attempt}: fresh start", flush=True)
        run_cfg = f"/tmp/babysit_cfg_{os.getpid()}.yaml"
        with open(run_cfg, "w") as f:
            yaml.safe_dump(cfg, f)

        # per-run log: the stall watchdog monitors this file's growth, so
        # concurrent babysitters must not share it
        run_tag = base_cfg["logger"]["name"].replace("/", "_")
        out_log = os.path.join("/tmp", f"babysit_{run_tag}.log")
        with open(out_log, "a") as logf:
            proc = subprocess.Popen(
                [sys.executable, os.path.join(REPO, "scripts", "run.py"),
                 "train", run_cfg],
                stdout=logf, stderr=subprocess.STDOUT, cwd=REPO,
            )
            # watchdog: kill if the log stops growing
            last_size = -1
            last_change = time.time()
            while proc.poll() is None:
                time.sleep(30)
                size = os.path.getsize(out_log)
                if size != last_size:
                    last_size = size
                    last_change = time.time()
                elif time.time() - last_change > stall_timeout:
                    print(f"[babysit] stalled {stall_timeout}s - killing",
                          flush=True)
                    proc.send_signal(signal.SIGKILL)
                    break
            proc.wait()
        if proc.returncode == 0:
            print("[babysit] training finished", flush=True)
            return
        print(f"[babysit] run exited rc={proc.returncode}; restarting",
              flush=True)
        time.sleep(10)


if __name__ == "__main__":
    main()
