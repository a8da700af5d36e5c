#!/usr/bin/env python
"""NGP divergence: per-step instrumentation in a step window.

Logs, for every step in [lo, hi): loss, batch, samples/ray, and the global
gradient norm of each parameter group (hash table / mlp_base / mlp_head /
background), plus density stats at occupied cells.  Usage:

  python scripts/diag_ngp2.py <budget_log2> <lo> <hi> [arch]
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

    from robust_e_nerf_tpu.engine import train as train_mod
    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.models import fields
    from robust_e_nerf_tpu.utils.config import load_config

    budget_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 230
    arch = sys.argv[4] if len(sys.argv) > 4 else "ngp"

    cfg = load_config(os.path.join(REPO, "configs", "train",
                                   "tpu-sphere.yaml"))
    cfg["data"]["dataset_directory"] = os.path.join(REPO, "datasets",
                                                    "sphere")
    cfg["data"]["train_eff_ray_sample_batch_size"] = 1 << budget_log2
    cfg["data"]["train_ray_batch_capacity"] = 8192
    cfg["model"]["nerf"]["arch"] = arch
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    spec = trainer.spec

    def tree_norm(t):
        leaves = jax.tree_util.tree_leaves(t)
        return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                            for l in leaves))

    @jax.jit
    def grad_stats(params, buffers, event_table, occ_binary, batch_size,
                   key):
        def loss_of(p):
            batch = train_mod.sample_device_batch(
                event_table, jax.random.fold_in(key, 1),
                spec.batch_capacity, spec.has_bayer,
            )
            batch["valid"] = (
                jnp.arange(spec.batch_capacity, dtype=jnp.int32)
                < batch_size
            )
            loss, aux = train_mod.train_loss_fn(
                p, buffers, occ_binary, batch,
                jax.random.fold_in(key, 2), spec, axis_name=None,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params
        )
        rf = grads["nerf"]["radiance_field"]
        out = {"loss": loss, "spr": aux["mean_num_samples_per_ray"]}
        for name in rf:
            out[f"g_{name}"] = tree_norm(rf[name])
        prf = params["nerf"]["radiance_field"]
        for name in prf:
            out[f"p_{name}"] = tree_norm(prf[name])
        return out

    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    for i in range(hi):
        trainer.params = state[0]
        trainer.global_step = i
        trainer.maybe_update_occ_grid()
        state = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )
        if lo <= i < hi:
            params, _opt, ctrl = state[0], state[1], state[2]
            loss, aux = state[3], state[4]
            gs = grad_stats(
                params, trainer.buffers, trainer.device_table,
                trainer.occ_state["binary"], ctrl["batch_size"],
                jax.random.fold_in(trainer._key, 10_000 + i),
            )
            host = jax.device_get({
                "loss": loss, "batch": aux["batch_size"],
                "spr": aux["mean_num_samples_per_ray"], "gs": gs,
            })
            g = host["gs"]
            extras = " ".join(
                f"{k} {float(v):9.3e}" for k, v in sorted(g.items())
                if k not in ("loss", "spr")
            )
            print(
                f"step {i:4d} loss {float(host['loss']):8.4f} "
                f"batch {int(host['batch']):5d} "
                f"spr {float(host['spr']):6.1f} | probe_loss "
                f"{float(g['loss']):8.4f} {extras}",
                flush=True,
            )
    jax.block_until_ready(state[0])


if __name__ == "__main__":
    main()
