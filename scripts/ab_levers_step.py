#!/usr/bin/env python
"""Lean adaptive-lever A/B: time ONLY the full train step per combo.

The round-4 A/B (run_steady_ab.sh + profile_hotpath.py) compiles seven
stage jits per lever combo — most of an hour of axon remote-compile per
run — when the default-on/off decision needs exactly two numbers per
combo: the full train-step time and the visible/marched ratio.  This
driver restores one checkpoint, then for each (visible_compact,
sample_bucket_levels) combo rebuilds the Trainer with the env overrides
(models/nerf.py honors REN_VISIBLE_COMPACT / REN_SAMPLE_BUCKETS),
warms up, and times the production step — one compile per combo.

Usage:
  REN_AB_CKPT=<ckpt.npz> [REN_PROF_DATASET=datasets/sphere-128] \
      python scripts/ab_levers_step.py [arch] [budget_log2] [combos]
combos defaults to "baseline,ladder4,viscompact,both".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = {
    "baseline": {"REN_VISIBLE_COMPACT": "0", "REN_SAMPLE_BUCKETS": "1"},
    "ladder4": {"REN_VISIBLE_COMPACT": "0", "REN_SAMPLE_BUCKETS": "4"},
    "viscompact": {"REN_VISIBLE_COMPACT": "1", "REN_SAMPLE_BUCKETS": "1"},
    "both": {"REN_VISIBLE_COMPACT": "1", "REN_SAMPLE_BUCKETS": "4"},
}


def bench_combo(arch, budget_log2, ckpt, name, env, n=5, warmup=6):
    import jax

    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.utils.config import load_config

    os.environ.update(env)
    cfg = load_config(os.path.join(REPO, "configs", "train",
                                   "tpu-sphere.yaml"))
    cfg["data"]["dataset_directory"] = os.environ.get(
        "REN_PROF_DATASET",
        os.path.join(REPO, "datasets", "sphere"),
    )
    cfg["data"]["train_eff_ray_sample_batch_size"] = 1 << budget_log2
    cfg["data"]["train_ray_batch_capacity"] = int(
        os.environ.get("REN_PROF_CAP", 32768)
    )
    cfg["model"]["nerf"]["arch"] = arch
    if os.environ.get("REN_PROF_OCC_RES"):
        # must match the checkpoint's occupancy-grid resolution
        cfg["model"]["nerf"]["occ_grid"]["resolution"] = int(
            os.environ["REN_PROF_OCC_RES"]
        )
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    trainer.restore(ckpt)
    base_step = int(trainer.global_step or 0)
    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    for i in range(warmup):
        trainer.params = state[0]
        trainer.global_step = base_step + i
        trainer.maybe_update_occ_grid()
        state = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )[:3]
    out = trainer.train_step(
        state[0], state[1], state[2], trainer.buffers,
        trainer.device_table, trainer.occ_state["binary"], trainer._key,
    )
    aux = jax.device_get(out[4])
    t0 = time.time()
    for _ in range(n):
        out = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )
    jax.device_get(out[3])
    ms = (time.time() - t0) / n * 1000.0
    visible = float(aux["mean_num_samples_per_ray"])
    marched = float(aux.get("mean_marched_per_ray", visible))
    print(
        f"{name:11s} step {ms:8.1f} ms  batch {int(aux['batch_size']):6d}"
        f"  visible/ray {visible:7.1f}  marched/ray {marched:7.1f}"
        f"  visible/marched {visible / max(marched, 1e-9):.3f}",
        flush=True,
    )
    # drop device references before the next combo's Trainer allocates
    del state, out, trainer
    import gc

    gc.collect()
    return ms


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "ngp"
    budget_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    names = (sys.argv[3].split(",") if len(sys.argv) > 3
             else list(COMBOS))
    ckpt = os.environ["REN_AB_CKPT"]

    import jax

    forced = os.environ.get("REN_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    print(f"A/B arch={arch} budget=2^{budget_log2} ckpt={ckpt} "
          f"dataset={os.environ.get('REN_PROF_DATASET', 'datasets/sphere')}")
    results = {}
    for name in names:
        results[name] = bench_combo(arch, budget_log2, ckpt, name,
                                    COMBOS[name])
    best = min(results, key=results.get)
    print(f"fastest: {best} ({results[best]:.1f} ms)")


if __name__ == "__main__":
    main()
