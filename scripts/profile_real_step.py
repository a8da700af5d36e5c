#!/usr/bin/env python
"""Attribute a REAL steady-state train step, component by component.

Round-4 gap (VERDICT #1): the ngp step measures 7.58 s against a
computed scatter floor of ~5.6 s, and the standalone stage rows from
profile_hotpath.py could not explain the difference because they probe
a synthetic ray batch (one camera origin, random directions) whose
marched-sample distribution differs from training's.

This profiler times the step's ACTUAL constituents on the ACTUAL data
the step consumes: the device event-batch sampler, the two l_diff
renders at the real supervision timestamps of a real sampled batch
(fwd and fwd+bwd), the optimizer update on the real gradient pytree,
and the full jitted step — so the rows must sum to ~the step and the
residual (XLA fusion boundaries, controller/NaN-guard bookkeeping,
aux reductions) is measured rather than guessed.

Stages (all jitted, all timed with device_get syncs):
  sample     sample_device_batch — event gather + supervision samplers
  rays       refractory + trajectory interp + pixel->ray for endpoint 0
  march      march_and_compact on those real rays
  field_fwd  field_apply at the real compacted sample positions
  field_f+b  + its vjp (the table-gradient scatter)
  render_f+b render_log_intensity + vjp, endpoint 0 and endpoint 1
  loss_f+b   value_and_grad of the full train_loss_fn (= the step's
             gradient computation, incl. both renders + loss algebra)
  optimizer  optimizer.update + apply + tau clamp on real grads
  train_step the full production step (sampling inside)

Usage:
  REN_PROFILE_CKPT=logs/train/ngp-64-r4/version_0/checkpoints/last.npz \
      python scripts/profile_real_step.py [ngp|tensorf] [budget_log2]
Env:
  REN_PROF_CAP      ray-batch capacity (default 32768, the quality-run
                    value — restored controller state must stay in range)
  REN_PROFILE_TRACE directory: also dump a jax.profiler trace of the
                    timed full-step loop
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET = os.path.join(REPO, "datasets", "sphere")


def timeit(fn, *args, n=4, warmup=1):
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

    # REN_PLATFORM=cpu: smoke-test off-chip (the axon TPU plugin ignores
    # JAX_PLATFORMS; the config knob must be set before first backend use)
    forced = os.environ.get("REN_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("REN_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/ren_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from robust_e_nerf_tpu.engine import train as train_mod
    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.models import event_model, fields
    from robust_e_nerf_tpu.models import nerf as nerf_mod
    from robust_e_nerf_tpu.models import trajectory as traj_mod
    from robust_e_nerf_tpu.ops import ray_march
    from robust_e_nerf_tpu.utils.config import load_config

    arch = sys.argv[1] if len(sys.argv) > 1 else "ngp"
    budget_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cfg = load_config(os.path.join(REPO, "configs", "train",
                                   "tpu-sphere.yaml"))
    cfg["data"]["dataset_directory"] = os.environ.get("REN_PROF_DATASET",
                                                      DATASET)
    cfg["data"]["train_eff_ray_sample_batch_size"] = 1 << budget_log2
    cfg["data"]["train_ray_batch_capacity"] = int(
        os.environ.get("REN_PROF_CAP", 32768)
    )
    cfg["model"]["nerf"]["arch"] = arch
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    spec = trainer.spec
    march_spec = spec.nerf.march_train

    ckpt = os.environ.get("REN_PROFILE_CKPT")
    if ckpt:
        trainer.restore(ckpt)
        print(f"restored checkpoint {ckpt} (step {trainer.global_step})")

    # settle occupancy + controller at the restored field
    base_step = int(getattr(trainer, "global_step", 0) or 0)
    state = (trainer.params, trainer.opt_state, trainer.ctrl)
    for i in range(10):
        trainer.params = state[0]
        trainer.global_step = base_step + i
        trainer.maybe_update_occ_grid()
        state = trainer.train_step(
            state[0], state[1], state[2], trainer.buffers,
            trainer.device_table, trainer.occ_state["binary"],
            trainer._key,
        )[:3]
    params, opt_state, ctrl = state
    host_ctrl = jax.device_get(ctrl)
    batch_size = int(host_ctrl["batch_size"])
    cap = spec.batch_capacity
    print(f"arch={arch} budget=2^{budget_log2} steady batch={batch_size} "
          f"ray capacity={cap} K={march_spec.capacity} "
          f"S={march_spec.max_samples_per_ray}")

    buffers = trainer.buffers
    occ = trainer.occ_state["binary"]
    table = trainer.device_table
    aabb = buffers["aabb"]
    step_dev = ctrl["step"]
    key = jax.random.fold_in(trainer._key, ctrl["step"])

    # ---- stage: sample -------------------------------------------------
    sample_j = jax.jit(lambda k: train_mod.sample_device_batch(
        table, k, cap, spec.has_bayer))
    t_sample = timeit(sample_j, key, n=8, warmup=2)
    batch = sample_j(key)
    batch["valid"] = jnp.arange(cap, dtype=jnp.int32) < batch_size

    # ---- real supervision endpoints (train_loss_fn lines, diff loss) ---
    def endpoints(p, b):
        start_lo, interval = event_model.apply_refractory_period(
            p["refractory_period"], buffers["refractory_period"],
            b["start_ts_lo"], b["interval"],
        )
        ts_diff = interval * b["normalized_ts_diff"]
        off_start = b["normalized_diff_start_ts"] * jnp.maximum(
            interval - ts_diff, 0.0
        )
        off_end = jnp.minimum(off_start + ts_diff, interval)
        return start_lo + off_start, start_lo + off_end

    lo0, lo1 = jax.jit(endpoints)(params, batch)
    hi = batch["start_ts_hi"]
    valid = batch["valid"]
    chan = batch.get("channel_idx")

    # ---- stage: rays (trajectory interp + pixel->ray), endpoint 0 ------
    def rays_at(p, lo):
        start_lo, _ = event_model.apply_refractory_period(
            p["refractory_period"], buffers["refractory_period"],
            batch["start_ts_lo"], batch["interval"],
        )
        del start_lo
        position, rotation = traj_mod.interpolate_pose(
            buffers["trajectory"], hi, lo
        )
        return nerf_mod.pixel_params_to_ray(
            buffers["train_intrinsics_inv"], batch["position"],
            position, rotation,
        )

    rays_j = jax.jit(rays_at)
    t_rays = timeit(rays_j, params, lo0, n=8, warmup=2)
    origins, dirs = rays_j(params, lo0)

    # ---- stage: march on the REAL rays ---------------------------------
    km = jax.random.fold_in(key, 1)
    march_j = jax.jit(lambda o, d, v, g: ray_march.march_and_compact(
        o, d, v, g, aabb, spec.nerf.occ, march_spec, key=km))
    buf = march_j(origins, dirs, valid, occ)
    total = int(buf["total"])
    print(f"marched total={total} (K capacity {march_spec.capacity}), "
          f"{total / max(batch_size, 1):.1f} samples/ray")
    t_march = timeit(march_j, origins, dirs, valid, occ)

    positions, pdirs = ray_march.sample_positions(buf, origins, dirs)
    nerf_params = params["nerf"]

    # ---- stage: field at the REAL compacted positions ------------------
    field_j = jax.jit(lambda p, x, d: fields.field_apply(
        p["radiance_field"], x, d, aabb, spec.nerf.field))
    t_field = timeit(field_j, nerf_params, positions, pdirs)

    def field_loss(p, x, d):
        rad, sig = fields.field_apply(p["radiance_field"], x, d, aabb,
                                      spec.nerf.field)
        return jnp.sum(rad) + jnp.sum(sig)

    t_field_fb = timeit(jax.jit(jax.grad(field_loss)), nerf_params,
                        positions, pdirs)

    # ---- stage: one full render f+b at each REAL endpoint --------------
    def render_loss(p, lo, k):
        logI, opacity, _nv, _tot, is_valid, _regs = (
            train_mod.render_log_intensity(
                p, buffers, occ, spec, batch["position"], chan, hi, lo,
                valid, k, march_spec,
            )
        )
        keep = is_valid & valid
        return jnp.sum(jnp.where(keep, logI, 0.0))

    r_fb = jax.jit(jax.grad(render_loss))
    t_render0 = timeit(r_fb, params, lo0, jax.random.fold_in(key, 2))
    t_render1 = timeit(r_fb, params, lo1, jax.random.fold_in(key, 3))

    # ---- stage: the step's full gradient computation --------------------
    frozen = tuple(
        name for name in ("contrast_threshold", "refractory_period", "nerf")
        if bool(cfg["model"][name]["freeze"])
    )

    def loss_with_sampling(p, k):
        kb, kl = jax.random.split(k)
        b = train_mod.sample_device_batch(table, kb, cap, spec.has_bayer)
        b["valid"] = jnp.arange(cap, dtype=jnp.int32) < batch_size
        p = {
            name: (jax.lax.stop_gradient(comp)
                   if name in frozen else comp)
            for name, comp in p.items()
        }
        loss, aux = train_mod.train_loss_fn(
            p, buffers, occ, b, kl, spec, axis_name=None, step=step_dev,
        )
        return loss, aux

    lag_j = jax.jit(jax.value_and_grad(loss_with_sampling, has_aux=True))
    t_loss_fb = timeit(lag_j, params, key)
    (_loss, _aux), grads = lag_j(params, key)

    # ---- stage: optimizer ------------------------------------------------
    def opt_step(g, o, p):
        updates, new_o = trainer.optimizer.update(g, o, p)
        new_p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        new_p["refractory_period"]["raw_tau"] = event_model.clamp_raw_tau(
            new_p["refractory_period"]["raw_tau"],
            buffers["refractory_period"]["max_refractory_period"],
        )
        return new_p, new_o

    t_opt = timeit(jax.jit(opt_step), grads, opt_state, params, n=8,
                   warmup=2)

    # ---- stage: the production step --------------------------------------
    def full_step():
        return trainer.train_step(
            params, opt_state, ctrl, buffers, table, occ, trainer._key,
        )

    trace_dir = os.environ.get("REN_PROFILE_TRACE")
    if trace_dir:
        full_step()  # ensure compiled before tracing
        with jax.profiler.trace(trace_dir):
            jax.device_get(jax.tree_util.tree_leaves(full_step())[0])
        print(f"trace written to {trace_dir}")
    t_step = timeit(full_step)

    two_render = t_render0 + t_render1
    accounted = t_sample + t_loss_fb + t_opt
    print()
    print(f"sample       {t_sample:9.1f} ms   (event gather + samplers)")
    print(f"rays         {t_rays:9.1f} ms   (refractory + traj interp + "
          f"pixel->ray)")
    print(f"march        {t_march:9.1f} ms   (real rays)")
    print(f"field_fwd    {t_field:9.1f} ms   ({total} real positions)")
    print(f"field_f+b    {t_field_fb:9.1f} ms")
    print(f"render_f+b   {t_render0:9.1f} ms   (endpoint 0)")
    print(f"render_f+b   {t_render1:9.1f} ms   (endpoint 1)")
    print(f"loss_f+b     {t_loss_fb:9.1f} ms   (full gradient: both "
          f"renders + loss algebra + sampling)")
    print(f"optimizer    {t_opt:9.1f} ms   (adam update + tau clamp)")
    print(f"train_step   {t_step:9.1f} ms   (production jit)")
    print()
    print(f"sum(sample + loss_f+b + optimizer) = {accounted:.1f} ms "
          f"-> residual vs step = {t_step - accounted:+.1f} ms "
          f"({100.0 * (t_step - accounted) / t_step:.1f}% of step: "
          f"controller + NaN guard + fusion-boundary effects)")
    print(f"loss_f+b vs 2x render_f+b = {t_loss_fb:.1f} vs "
          f"{two_render:.1f} ms -> {t_loss_fb - two_render:+.1f} ms "
          f"(loss algebra + aux reductions + jit-boundary deltas)")


if __name__ == "__main__":
    main()
