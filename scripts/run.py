#!/usr/bin/env python
"""Training, validation & testing CLI.

Keeps the reference's surface exactly (scripts/run.py:131-144):

    python scripts/run.py {train,val,test} <config.yaml>

with the same YAML schema (configs/*.yaml) and the same outputs: a versioned
log directory containing the config snapshot, TensorBoard events,
checkpoints, optional prediction PNGs, and `metrics.yaml` after val/test.
"""

import argparse
import os
import shutil
import subprocess
import sys

import yaml

PROJECT_DIR = os.path.join(sys.path[0], "..")
sys.path.insert(1, PROJECT_DIR)

STAGES = ["train", "val", "test"]
METRICS_FILENAME = "metrics.yaml"


def main(args):
    from robust_e_nerf_tpu.utils.config import load_config

    config = load_config(args.config)

    # record the git HEAD hash (run.py:27-29)
    try:
        config["git_head_hash"] = (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=PROJECT_DIR,
                stderr=subprocess.DEVNULL,
            ).decode("ascii").strip()
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        config["git_head_hash"] = None

    # matmul precision pin (run.py:35)
    import jax

    # The environment's experimental TPU plugin ignores JAX_PLATFORMS;
    # REN_PLATFORM forces a backend through jax.config before first use
    # (used by the CPU test harness).
    forced_platform = os.environ.get("REN_PLATFORM")
    if forced_platform:
        jax.config.update("jax_platforms", forced_platform)

    # persistent compilation cache: repeated runs skip XLA recompiles
    cache_dir = os.environ.get(
        "REN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ren_tpu_xla")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    precision = config.get("float32_matmul_precision", "highest")
    jax.config.update(
        "jax_default_matmul_precision",
        {"highest": "highest", "high": "tensorfloat32",
         "medium": "bfloat16"}[precision],
    )

    from robust_e_nerf_tpu.engine.trainer import Trainer

    trainer = Trainer(config)
    config["seed"] = trainer.seed

    logging_enabled = trainer.logging_enabled
    if logging_enabled and config["trainer"].get(
        "resume_from_checkpoint"
    ) is None:
        os.makedirs(trainer.log_dir, exist_ok=True)
        shutil.copy2(args.config, trainer.log_dir)

    metrics = None
    if args.stage == "train":
        trainer.fit()
    elif args.stage == "val":
        metrics = trainer.run_evaluation("val")
    elif args.stage == "test":
        metrics = trainer.run_evaluation("test")

    if args.stage != "train" and metrics is not None and logging_enabled:
        os.makedirs(trainer.log_dir, exist_ok=True)
        with open(
            os.path.join(trainer.log_dir, METRICS_FILENAME), "w"
        ) as f:
            yaml.safe_dump([metrics], f)
        print(yaml.safe_dump([metrics]))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Training, validation & testing script of the "
                    "TPU-native Robust e-NeRF"
    )
    parser.add_argument("stage", type=str, choices=STAGES,
                        help="Train, validation or test mode.")
    parser.add_argument("config", type=str,
                        help="Path to a configuration file in yaml format.")
    main(parser.parse_args())
