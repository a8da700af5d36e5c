#!/usr/bin/env python
"""Stage-by-stage timing of the training hot path on real hardware.

Times (with jax.device_get syncs, docs/PERFORMANCE.md methodology):
  march   — march_and_compact forward
  field   — field_apply forward at the compacted capacity
  render  — full render_rays forward
  rfwdbwd — render + vjp (the l_diff backward cost)
  step    — full train_step

Usage: python scripts/profile_hotpath.py [tensorf|ngp] [budget_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET = os.path.join(REPO, "datasets", "sphere")


def timeit(fn, *args, n=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.models import fields, nerf as nerf_mod
    from robust_e_nerf_tpu.ops import ray_march
    from robust_e_nerf_tpu.utils.config import load_config

    arch = sys.argv[1] if len(sys.argv) > 1 else "tensorf"
    budget_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    cfg = load_config(os.path.join(REPO, "configs", "train",
                                   "tpu-sphere.yaml"))
    cfg["data"]["dataset_directory"] = os.environ.get("REN_PROF_DATASET",
                                                      DATASET)
    cfg["data"]["train_eff_ray_sample_batch_size"] = 1 << budget_log2
    cfg["data"]["train_ray_batch_capacity"] = int(
        os.environ.get("REN_PROF_CAP", 8192)
    )
    cfg["model"]["nerf"]["arch"] = arch
    if os.environ.get("REN_PROF_BF16"):
        cfg["model"]["nerf"]["ngp"]["pos_encoding"]["table_read_dtype"] = (
            "bfloat16"
        )
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    spec = trainer.spec
    march_spec = spec.nerf.march_train

    # REN_PROFILE_CKPT: restore a trained checkpoint before timing, so
    # the profile measures the SHARP/steady regime (visible/ray <<
    # marched/ray) instead of the near-init fog where the
    # visible-compact lever has nothing to drop.  The warmup steps below
    # then re-settle the occupancy grid and the batch controller to the
    # restored field.
    ckpt = os.environ.get("REN_PROFILE_CKPT")
    if ckpt:
        trainer.restore(ckpt)
        print(f"restored checkpoint {ckpt} (step {trainer.global_step})")

    # steady state: some warmup steps so occupancy/batch size settle
    base_step = int(getattr(trainer, "global_step", 0) or 0)
    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    for i in range(20):
        trainer.params = state[0]  # occ updates must see current params
        trainer.global_step = base_step + i
        trainer.maybe_update_occ_grid()
        state = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )[:3]
    params, opt_state, ctrl = state
    host_ctrl = jax.device_get(ctrl)
    batch = int(host_ctrl["batch_size"])
    print(f"arch={arch} budget=2^{budget_log2} steady batch={batch} "
          f"capacity(K)={march_spec.capacity} S={march_spec.max_samples_per_ray}")

    # build a representative ray batch
    key = jax.random.PRNGKey(7)
    b_cap = spec.batch_capacity
    k1, k2 = jax.random.split(key)
    traj = trainer.model.buffers["trajectory"]
    import numpy as np

    cam = np.asarray(jax.device_get(traj["position"]))[0]
    origins = jnp.broadcast_to(jnp.asarray(cam), (b_cap, 3))
    dirs = jax.random.normal(k1, (b_cap, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    valid = jnp.arange(b_cap) < batch
    occ = trainer.occ_state["binary"]
    aabb = trainer.buffers["aabb"]
    nerf_params = jax.device_get(params)["nerf"]
    nerf_params = jax.tree_util.tree_map(jnp.asarray, nerf_params)

    march = jax.jit(lambda o, d, v, g: ray_march.march_and_compact(
        o, d, v, g, aabb, spec.nerf.occ, march_spec, key=k2))
    buf = march(origins, dirs, valid, occ)
    total = int(buf["total"])
    print(f"marched total={total} (capacity {march_spec.capacity})")

    t_march = timeit(march, origins, dirs, valid, occ)

    # the visible-compact pre-pass (models/nerf.py:_compact_visible), when
    # the lever is on: a stop-gradient density forward + the visibility
    # scatter-compaction, the per-render overhead the steady-regime A/B
    # must attribute (VERDICT r3 weak #2)
    t_vis = None
    vis_total = None
    if nerf_mod._visible_compact_enabled(spec.nerf):
        viscompact = jax.jit(
            lambda p, b, o, d: nerf_mod._compact_visible(
                p, b, o, d, aabb, spec.nerf, march_spec
            )
        )
        buf_vis = viscompact(nerf_params, buf, origins, dirs)
        vis_total = int(buf_vis["total"])
        print(f"visible total={vis_total} "
              f"({100.0 * vis_total / max(total, 1):.1f}% of marched)")
        t_vis = timeit(viscompact, nerf_params, buf, origins, dirs)

    positions, pdirs = ray_march.sample_positions(buf, origins, dirs)

    field = jax.jit(lambda p, x, d: fields.field_apply(
        p["radiance_field"], x, d, aabb, spec.nerf.field))
    t_field = timeit(field, nerf_params, positions, pdirs)

    def render(p, o, d, v, g):
        return nerf_mod.render_rays(p, g, aabb, o, d, v, spec.nerf,
                                    march_spec, key=k2)

    render_j = jax.jit(render)
    t_render = timeit(render_j, nerf_params, origins, dirs, valid, occ)

    def render_loss(p, o, d, v, g):
        radiance, opacity, _d, _nv, _t, _regs = render(p, o, d, v, g)
        return jnp.sum(jnp.where(v[:, None], radiance, 0.0)) + jnp.sum(
            jnp.where(v, opacity, 0.0))

    rbwd = jax.jit(jax.grad(render_loss))
    t_rfwdbwd = timeit(rbwd, nerf_params, origins, dirs, valid, occ)

    def full_step():
        return trainer.train_step(
            params, opt_state, ctrl, trainer.buffers, trainer.device_table,
            trainer.occ_state["binary"], trainer._key,
        )

    t_step = timeit(full_step)

    # field fwd+bwd isolated (the table-gradient scatter cost)
    def field_loss(p, x, d):
        rad, sig = fields.field_apply(p["radiance_field"], x, d, aabb,
                                      spec.nerf.field)
        return jnp.sum(rad) + jnp.sum(sig)

    fbwd = jax.jit(jax.grad(field_loss))
    t_fbwd = timeit(fbwd, nerf_params, positions, pdirs)

    print(f"march_fwd   {t_march:8.1f} ms")
    if t_vis is not None:
        print(f"viscompact  {t_vis:8.1f} ms  (density pre-pass + "
              f"compaction; visible={vis_total})")
    print(f"field_fwd   {t_field:8.1f} ms")
    print(f"field_f+b   {t_fbwd:8.1f} ms")
    print(f"render_fwd  {t_render:8.1f} ms")
    print(f"render_f+b  {t_rfwdbwd:8.1f} ms")
    print(f"train_step  {t_step:8.1f} ms  (2 renders f+b + sampling + adam)")


if __name__ == "__main__":
    main()
