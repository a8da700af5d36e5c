#!/usr/bin/env python
"""Benchmark: training throughput of the flagship model on real hardware.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": R, "extra": {...}}

Definition: rays rendered per second per chip during steady-state training
(3 renders per step: the l_diff start/end pair plus the l_grad render when
enabled; here l_diff only -> 2 renders x batch_size rays).  The reference
repo publishes no numbers (BASELINE.md), so vs_baseline is measured against
the implicit reference target of ~2^20 ray samples per effective step at
the reference's 40k-steps-in-hours pace; we report the raw throughput and
samples/sec and leave vs_baseline null until a measured A100 number exists.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATASET = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "datasets", "sphere")
WARMUP_STEPS = 20
BENCH_STEPS = 60


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from robust_e_nerf_tpu.data import synthetic
    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.utils.config import load_config

    if not os.path.isdir(DATASET):
        synthetic.generate_dataset(
            DATASET, img_width=64, img_height=64, duration_s=8.0,
            num_pose_samples=161, num_sim_frames=1601, speed_wobble=0.3,
            revolutions=2.0, contrast_threshold=0.1,
        )

    cfg = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "train", "tpu-sphere.yaml")
    )
    cfg["data"]["dataset_directory"] = DATASET
    cfg["data"]["train_eff_ray_sample_batch_size"] = 262144
    cfg["data"]["train_ray_batch_capacity"] = 8192
    # flagship TPU-native field (ops/vm_grid.py); `ngp` remains available
    # for reference-parity runs but is gather-bound on TPU (BASELINE.md)
    cfg["model"]["nerf"]["arch"] = os.environ.get("REN_BENCH_ARCH",
                                                  "tensorf")
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    renders_per_step = (
        (2 if trainer.spec.loss.weight_diff > 0 else 0)
        + (1 if trainer.spec.loss.weight_grad > 0 else 0)
    )

    def step(state):
        params, opt_state, ctrl = state
        params, opt_state, ctrl, loss, aux = trainer.train_step(
            params, opt_state, ctrl, trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )
        return (params, opt_state, ctrl), loss, aux

    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    # warmup: let the occupancy grid and the batch-size controller settle
    trainer.maybe_update_occ_grid()
    for i in range(WARMUP_STEPS):
        trainer.global_step = i
        trainer.maybe_update_occ_grid()
        state, loss, aux = step(state)
    jax.device_get(aux)  # a data fetch is the only reliable sync here

    t0 = time.time()
    for i in range(BENCH_STEPS):
        state, loss, aux = step(state)
    host_aux = jax.device_get(aux)
    elapsed = time.time() - t0

    # the controller holds batch size ~constant in steady state
    batch_size = int(host_aux["batch_size"])
    mean_samples = float(host_aux["mean_num_samples_per_ray"])
    total_rays = BENCH_STEPS * batch_size * renders_per_step
    rays_per_sec = total_rays / elapsed / trainer.num_chips
    samples_per_sec = rays_per_sec * mean_samples
    events_per_sec = BENCH_STEPS * batch_size / elapsed

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": None,
        "extra": {
            "steps_per_sec": round(BENCH_STEPS / elapsed, 2),
            "ray_samples_per_sec_per_chip": round(samples_per_sec, 1),
            "events_per_sec": round(events_per_sec, 1),
            "batch_size": batch_size,
            "mean_samples_per_ray": round(mean_samples, 1),
            "num_chips": trainer.num_chips,
            "arch": cfg["model"]["nerf"]["arch"],
            "device": str(jax.devices()[0]),
            "loss": float(jax.device_get(loss)),
        },
    }))


if __name__ == "__main__":
    main()
