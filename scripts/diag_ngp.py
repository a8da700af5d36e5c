#!/usr/bin/env python
"""Reproduce + instrument the NGP post-warmup divergence (ROADMAP #8).

Runs ngp on the sphere dataset at a given sample budget and prints, every
occupancy update: loss, batch size, samples/ray, occupied-cell fraction,
occs mean/max, and the density distribution at occupied cells.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.models import contraction, fields
    from robust_e_nerf_tpu.utils.config import load_config

    budget_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600

    cfg = load_config(os.path.join(REPO, "configs", "train",
                                   "tpu-sphere.yaml"))
    cfg["data"]["dataset_directory"] = os.path.join(
        REPO, "datasets", os.environ.get("REN_DIAG_DATASET", "sphere")
    )
    cfg["data"]["train_eff_ray_sample_batch_size"] = 1 << budget_log2
    cfg["data"]["train_ray_batch_capacity"] = int(
        os.environ.get("REN_DIAG_CAP", 8192)
    )
    cfg["model"]["nerf"]["arch"] = os.environ.get("REN_DIAG_ARCH", "ngp")
    if "REN_DIAG_WD" in os.environ:
        cfg["loss"]["weight"]["nerf_mlp_weight_decay"] = float(
            os.environ["REN_DIAG_WD"]
        )
    if "REN_DIAG_LR" in os.environ:
        cfg["optimizer"]["lr"]["default"] = float(os.environ["REN_DIAG_LR"])
    if "REN_DIAG_DIFF_FN" in os.environ:
        # l_diff error-fn experiments (loss.py:26-30 surface {l1,mse,mape}):
        # mse's gradient scales with (pred_diff - target), which early in
        # training coherently prefers pred_diff == 0 (variance reduction)
        # and can crush a smooth-basis field's density to zero; l1's
        # sign-based gradient is incoherent while predictions are
        # uncorrelated with targets
        cfg["loss"]["error_fn"]["log_intensity_diff"] = (
            os.environ["REN_DIAG_DIFF_FN"]
        )
    if "REN_DIAG_SREG" in os.environ:
        cfg["loss"]["weight"]["density_sparsity"] = float(
            os.environ["REN_DIAG_SREG"]
        )
    if "REN_DIAG_DIST" in os.environ:
        cfg["loss"]["weight"]["distortion"] = float(
            os.environ["REN_DIAG_DIST"]
        )
    if "REN_DIAG_MILESTONES" in os.environ:
        # lr-decay experiments: epochs are limit_train_batches (=1000) steps
        cfg["lr_scheduler"]["multi_step_lr"]["milestones"] = [
            int(m) for m in os.environ["REN_DIAG_MILESTONES"].split(",")
        ]
    if "REN_DIAG_SREG_MODE" in os.environ:
        # schedule experiments (ROADMAP round-3 item 1):
        #   exp: REN_DIAG_SREG_STEPS / REN_DIAG_SREG_RATE / REN_DIAG_SREG_FLOOR
        #   occ: REN_DIAG_SREG_LO / REN_DIAG_SREG_HI
        cfg["loss"]["density_sparsity_schedule"] = {
            "mode": os.environ["REN_DIAG_SREG_MODE"],
            "hold_steps": float(os.environ.get("REN_DIAG_SREG_HOLD", 0)),
            "decay_steps": float(
                os.environ.get("REN_DIAG_SREG_STEPS", 2000)
            ),
            "decay_rate": float(os.environ.get("REN_DIAG_SREG_RATE", 0.1)),
            "floor": float(os.environ.get("REN_DIAG_SREG_FLOOR", 0.0)),
            "occ_frac_lo": float(os.environ.get("REN_DIAG_SREG_LO", 0.02)),
            "occ_frac_hi": float(os.environ.get("REN_DIAG_SREG_HI", 0.10)),
        }
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    spec = trainer.spec

    # density probe at fixed cell centers (occupied ones reported)
    occ_spec = spec.nerf.occ
    res = occ_spec.resolution
    idx = np.arange(occ_spec.num_cells)
    z = idx % res[2]
    y = (idx // res[2]) % res[1]
    x = idx // (res[1] * res[2])
    u = (np.stack([x, y, z], -1) + 0.5) / np.asarray(res)
    centers = contraction.contract_inv(
        jnp.asarray(u, jnp.float32), trainer.buffers["aabb"],
        occ_spec.contraction_type, 3,
    )

    @jax.jit
    def stats(params, occ_state):
        sigma = fields.field_query_density(
            params["nerf"]["radiance_field"], centers,
            trainer.buffers["aabb"], spec.nerf.field,
        ).reshape(-1)
        occs = occ_state["occs"]
        binary = occ_state["binary"]
        nb = jnp.maximum(jnp.sum(binary), 1)
        s_occ = jnp.where(binary, sigma, 0.0)
        return {
            "occ_frac": jnp.mean(binary.astype(jnp.float32)),
            "occs_mean": jnp.mean(occs),
            "occs_max": jnp.max(occs),
            "sigma_occ_mean": jnp.sum(s_occ) / nb,
            "sigma_occ_max": jnp.max(s_occ),
            "sigma_max": jnp.max(sigma),
        }

    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    for i in range(steps):
        # keep trainer.params current: the occupancy update must see the
        # trained field, exactly like Trainer._fit_loop
        trainer.params = state[0]
        trainer.global_step = i
        trainer.maybe_update_occ_grid()
        state = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )
        if i % 16 == 0 or i in (255, 257, 259, 263):
            params, _opt, ctrl = state[0], state[1], state[2]
            loss, aux = state[3], state[4]
            fetch = {
                "loss": loss,
                "batch": aux["batch_size"],
                "spr": aux["mean_num_samples_per_ray"],
                "stats": stats(params, trainer.occ_state),
            }
            for reg in ("distortion", "density_sparsity"):
                if f"loss/{reg}" in aux:
                    fetch[reg] = aux[f"loss/{reg}"]
            host = jax.device_get(fetch)
            s = host["stats"]
            extra = "".join(
                f" {reg[:4]} {float(host[reg]):.2e}"
                for reg in ("distortion", "density_sparsity")
                if reg in host
            )
            print(
                f"step {i:4d} loss {float(host['loss']):8.4f} "
                f"batch {int(host['batch']):5d} spr {float(host['spr']):6.1f} "
                f"occ% {100*float(s['occ_frac']):5.2f} occs(mean/max) "
                f"{float(s['occs_mean']):.2e}/{float(s['occs_max']):.2e} "
                f"sigma@occ(mean/max) {float(s['sigma_occ_mean']):.2e}/"
                f"{float(s['sigma_occ_max']):.2e} "
                f"sigma_max {float(s['sigma_max']):.2e}" + extra,
                flush=True,
            )
        state = state[:3]


if __name__ == "__main__":
    main()
