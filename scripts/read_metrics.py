#!/usr/bin/env python
"""Dump scalar metrics from a TensorBoard event directory as YAML."""

import argparse
import glob
import os
import sys

sys.path.insert(1, os.path.join(sys.path[0], ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("log_dir")
    parser.add_argument("--tags", nargs="*", default=None)
    args = parser.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    paths = glob.glob(os.path.join(args.log_dir, "events.out.tfevents.*"))
    if not paths:
        raise SystemExit(f"no event files under {args.log_dir}")
    acc = EventAccumulator(args.log_dir)
    acc.Reload()
    for tag in sorted(acc.Tags()["scalars"]):
        if args.tags and tag not in args.tags:
            continue
        events = acc.Scalars(tag)
        last = events[-1]
        print(f"{tag}: {last.value:.6f}   (step {last.step}, "
              f"{len(events)} points)")


if __name__ == "__main__":
    main()
