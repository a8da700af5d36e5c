"""End-to-end engine tests on a tiny synthetic dataset.

Expensive jit compiles are shared through module-scoped fixtures; the
multi-chip test runs the same step on the virtual 8-device CPU mesh
(SURVEY.md section 4's answer to multi-node testing).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e_nerf_tpu.data import synthetic
from robust_e_nerf_tpu.engine import checkpoint as ckpt_mod
from robust_e_nerf_tpu.engine.trainer import Trainer
from robust_e_nerf_tpu.parallel import mesh as mesh_mod
from robust_e_nerf_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("engine_ds"))
    synthetic.generate_dataset(
        out, img_width=24, img_height=24, duration_s=2.0,
        num_pose_samples=41, num_sim_frames=81, num_train_views=2,
        num_val_views=2, num_test_views=2,
    )
    return out


def tiny_config(dataset, tmp_path, **overrides):
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "train",
                     "tpu-sphere.yaml")
    )
    cfg.data.dataset_directory = dataset
    cfg.data.train_eff_ray_sample_batch_size = 16384
    cfg.data.train_init_eff_batch_size = 512
    cfg.data.train_ray_batch_capacity = 2048
    cfg.model.nerf.occ_grid.resolution = 32
    cfg.model.nerf.occ_grid.warmup_steps = 8
    cfg.model.nerf.eval_sample_capacity = 1 << 17
    cfg.model.nerf.test_chunk_size = 576
    cfg.model.nerf.ngp.pos_encoding.n_levels = 4
    cfg.model.nerf.ngp.pos_encoding.log2_hashmap_size = 12
    cfg.trainer.max_epochs = 1
    cfg.trainer.limit_train_batches = 25
    cfg.trainer.log_every_n_steps = 10
    cfg.logger.save_dir = str(tmp_path / "logs")
    for key, value in overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return cfg


@pytest.fixture(scope="module")
def trained(dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine_run")
    cfg = tiny_config(dataset, tmp)
    trainer = Trainer(cfg)
    losses = []
    orig_step = trainer.train_step

    def recording_step(*args, **kwargs):
        out = orig_step(*args, **kwargs)
        losses.append(float(out[3]))
        return out

    trainer.train_step = recording_step
    trainer.fit()
    trainer.losses = losses
    return trainer


def test_loss_decreases(trained):
    losses = trained.losses
    assert len(losses) == 25
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_dynamic_batch_size_controller(trained):
    # the controller retargets batch size = budget / mean samples per ray
    ctrl = jax.device_get(trained.ctrl)
    assert int(ctrl["step"]) == trained.global_step
    assert int(ctrl["batch_size"]) != 512
    assert 1 <= int(ctrl["batch_size"]) <= trained.global_batch_capacity


def test_retarget_batch_size_capacity_clamp():
    """The static-buffer clamp (the one deliberate controller deviation,
    engine/train.py:retarget_batch_size): when visible samples/ray falls
    far below marched samples/ray, the reference retarget budget/visible
    would overflow the fixed marched-sample buffer; the clamp bounds the
    next batch by 0.92 * sample_capacity / marched-per-ray instead."""
    from robust_e_nerf_tpu.engine.train import retarget_batch_size

    budget, capacity = 2**20, int(1.25 * 2**20)
    args = dict(prev_batch=jnp.int32(4096), apply=jnp.bool_(True),
                sample_budget=budget, sample_capacity=capacity,
                ray_capacity=32768)

    # fog regime (visible == marched): the reference retarget, unclamped
    fog = retarget_batch_size(jnp.float32(256.0), jnp.float32(256.0),
                              **args)
    assert int(fog) == budget // 256

    # sharp regime (visible << marched): the retarget budget/visible
    # (= 2^20 / 16 = 65536 rays -> 65536 * 200 marched = 10x capacity)
    # must be cut to 0.92 * capacity / marched-per-ray
    sharp = retarget_batch_size(jnp.float32(16.0), jnp.float32(200.0),
                                **args)
    assert int(sharp) == int(0.92 * capacity / 200.0)
    assert int(sharp) * 200 <= capacity

    # no visible samples or a non-finite step: keep the previous batch
    dead = retarget_batch_size(jnp.float32(0.0), jnp.float32(200.0),
                               **args)
    assert int(dead) == 4096
    frozen = retarget_batch_size(
        jnp.float32(256.0), jnp.float32(256.0),
        jnp.int32(4096), jnp.bool_(False), budget, capacity, 32768,
    )
    assert int(frozen) == 4096

    # the ray-capacity clip still applies on top
    tiny = retarget_batch_size(jnp.float32(1.0), jnp.float32(1.0),
                               jnp.int32(1), jnp.bool_(True),
                               budget, capacity, 8192)
    assert int(tiny) == 8192


def test_eval_metrics_finite(trained):
    metrics = trained.run_evaluation("val")
    assert set(metrics) == {"val/l1", "val/psnr", "val/ssim", "val/lpips"}
    assert np.isfinite(metrics["val/l1"])
    assert np.isfinite(metrics["val/psnr"])
    assert -1 <= metrics["val/ssim"] <= 1


def test_resolve_checkpoint_path(tmp_path):
    """`model.checkpoint_filepath` accepts a best.json sidecar or a log
    directory and resolves to the recorded best model — the counterpart of
    Lightning's `ckpt_path="best"` (run.py:72-77)."""
    import json as _json

    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    best = ckdir / "epoch=1-step=200.npz"
    np.savez(best, dummy=np.zeros(1))
    with open(ckdir / "best.json", "w") as f:
        _json.dump({"monitor": "val/psnr", "mode": "max",
                    "best_model_path": str(best),
                    "records": [{"score": 17.0, "path": str(best)}]}, f)
    # a concrete .npz passes through unchanged
    assert ckpt_mod.resolve_checkpoint_path(str(best)) == str(best)
    # the sidecar itself resolves
    assert ckpt_mod.resolve_checkpoint_path(
        str(ckdir / "best.json")) == str(best)
    # a directory resolves via <dir>/best.json or <dir>/checkpoints/best.json
    assert ckpt_mod.resolve_checkpoint_path(str(ckdir)) == str(best)
    assert ckpt_mod.resolve_checkpoint_path(str(tmp_path)) == str(best)
    # and load_checkpoint_flat accepts every spelling
    assert "dummy" in ckpt_mod.load_checkpoint_flat(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        empty = tmp_path / "empty"
        empty.mkdir()
        ckpt_mod.resolve_checkpoint_path(str(empty))


def test_checkpoint_roundtrip(trained, tmp_path):
    path = trained.save_checkpoint()
    assert os.path.isfile(path)
    flat = ckpt_mod.load_checkpoint_flat(path)
    params_before = jax.device_get(trained.params)
    restored = ckpt_mod.restore_params(flat, params_before)
    for (k1, a), (k2, b) in zip(
        sorted_flat(params_before), sorted_flat(restored)
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(flat["step"]) == trained.global_step


def sorted_flat(tree):
    from robust_e_nerf_tpu.utils import pytree

    return sorted(pytree.tree_to_flat_dict(tree).items())


def test_component_load_and_freeze(trained, dataset, tmp_path_factory):
    """Test-stage pattern (configs/test/synthetic.yaml:28-58): load all
    components from the train checkpoint and freeze ct/tau."""
    ckpt = trained.save_checkpoint()
    tmp = tmp_path_factory.mktemp("engine_load")
    cfg = tiny_config(
        dataset, tmp,
        **{
            "model.checkpoint_filepath": ckpt,
            "model.contrast_threshold.load_state_dict": True,
            "model.refractory_period.load_state_dict": True,
            "model.nerf.load_state_dict": True,
        },
    )
    t2 = Trainer(cfg)
    p_trained = jax.device_get(trained.params)
    p_loaded = jax.device_get(t2.params)
    np.testing.assert_array_equal(
        np.asarray(p_loaded["nerf"]["radiance_field"]["hash"]["table"]),
        np.asarray(p_trained["nerf"]["radiance_field"]["hash"]["table"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p_loaded["refractory_period"]["raw_tau"]),
        np.asarray(p_trained["refractory_period"]["raw_tau"]),
    )


def test_frozen_components_stay_fixed(trained):
    """ct/tau are frozen in this config -> their raw params never move."""
    params = jax.device_get(trained.params)
    from robust_e_nerf_tpu.utils import transforms

    # ct was initialized from calibration ratio = 1.0
    np.testing.assert_allclose(
        float(transforms.softplus(
            params["contrast_threshold"]["raw_p2n_ratio"]
        )),
        1.0, rtol=1e-5,
    )


def test_structural_freeze_matches_masked_grads(trained):
    """Frozen components are stop_gradient-pruned from the backward graph
    (the counterpart of the reference's requires_grad_(False) freeze,
    robust_e_nerf.py:265-292).  The resulting optimizer step must be
    equivalent to the mask-only path (gradients computed, then zeroed by
    the frozen optax group): same updated params for every component."""
    from robust_e_nerf_tpu.engine import train as train_mod

    t = trained
    common = dict(
        sample_budget=t.sample_budget, init_batch_size=t.init_batch_size,
        accum_steps=t.accumulate_grad_batches,
    )
    step_masked = train_mod.make_train_step(
        t.spec, t.optimizer, t.mesh, frozen_components=(), **common
    )
    step_pruned = train_mod.make_train_step(
        t.spec, t.optimizer, t.mesh,
        frozen_components=("contrast_threshold", "refractory_period"),
        **common,
    )
    args = (t.params, t.opt_state, t.ctrl, t.buffers, t.device_table,
            t.occ_state["binary"], t._key)
    params_masked = jax.device_get(step_masked(*args)[0])
    params_pruned = jax.device_get(step_pruned(*args)[0])
    flat_m = jax.tree_util.tree_leaves_with_path(params_masked)
    flat_p = jax.tree_util.tree_leaves(params_pruned)
    assert len(flat_m) == len(flat_p)
    for (path, leaf_m), leaf_p in zip(flat_m, flat_p):
        np.testing.assert_allclose(
            leaf_m, leaf_p, rtol=1e-5, atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_multichip_mesh(dataset, tmp_path_factory):
    """Same training step on all 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    tmp = tmp_path_factory.mktemp("engine_mc")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.gpus": [0, 1, 2, 3, 4, 5, 6, 7],
           "trainer.limit_train_batches": 3},
    )
    trainer = Trainer(cfg)
    assert trainer.num_chips == 8
    trainer.fit()
    assert trainer.global_step == 3


def test_balanced_valid_mask():
    mask = mesh_mod.balanced_valid_mask(16, 5, 4)
    # shards of 4 rows: counts 2,1,1,1
    blocks = mask.reshape(4, 4)
    np.testing.assert_array_equal(blocks.sum(axis=1), [2, 1, 1, 1])
    assert blocks[0, :2].all() and not blocks[0, 2:].any()


def test_resume_from_checkpoint(trained, dataset, tmp_path_factory):
    """Full training-state resume (trainer.resume_from_checkpoint)."""
    ckpt = trained.save_checkpoint()
    tmp = tmp_path_factory.mktemp("engine_resume")
    cfg = tiny_config(
        dataset, tmp, **{"trainer.resume_from_checkpoint": ckpt}
    )
    t2 = Trainer(cfg)
    assert t2.global_step == trained.global_step
    ctrl = jax.device_get(t2.ctrl)
    assert int(ctrl["step"]) == trained.global_step
    p1 = jax.device_get(trained.params)
    p2 = jax.device_get(t2.params)
    np.testing.assert_array_equal(
        np.asarray(p1["nerf"]["radiance_field"]["hash"]["table"]),
        np.asarray(p2["nerf"]["radiance_field"]["hash"]["table"]),
    )
    # occupancy state restored too
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(trained.occ_state["binary"])),
        np.asarray(jax.device_get(t2.occ_state["binary"])),
    )


def test_grad_accumulation(dataset, tmp_path_factory):
    """accumulate_grad_batches=2 (robust_e_nerf.py:373-379,924-938): one
    train_step call scans 2 micro-batches, averages their gradients, and
    applies ONE optimizer update."""
    tmp = tmp_path_factory.mktemp("engine_accum")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.accumulate_grad_batches": 2,
           "trainer.limit_train_batches": 3},
    )
    trainer = Trainer(cfg)
    assert trainer.accumulate_grad_batches == 2
    p_before = jax.device_get(trainer.params)
    trainer.fit()
    assert trainer.global_step == 3  # optimizer steps, not micro-batches
    p_after = jax.device_get(trainer.params)
    moved = np.abs(
        np.asarray(p_after["nerf"]["radiance_field"]["hash"]["table"])
        - np.asarray(p_before["nerf"]["radiance_field"]["hash"]["table"])
    ).max()
    assert moved > 0
    ctrl = jax.device_get(trainer.ctrl)
    assert int(ctrl["nonfinite_step"]) == -1


def test_nan_guard_freezes_and_raises(dataset, tmp_path_factory):
    """terminate_on_nan (run.py:94): a non-finite loss freezes all device
    state at the offending step and the host raises at its next fetch."""
    tmp = tmp_path_factory.mktemp("engine_nan")
    cfg = tiny_config(dataset, tmp, **{"trainer.limit_train_batches": 2})
    trainer = Trainer(cfg)

    # poison one field parameter -> the rendered loss goes non-finite
    params = jax.device_get(trainer.params)
    table = np.asarray(
        params["nerf"]["radiance_field"]["hash"]["table"]
    ).copy()
    table[:] = np.nan
    params["nerf"]["radiance_field"]["hash"]["table"] = table
    trainer.params = mesh_mod.put_replicated(params, trainer.mesh)
    # occupy the grid so rays actually march through the poisoned field
    # (an empty grid renders zeros — no samples, no NaN, like the
    # reference with zero marched samples)
    occ = jax.device_get(trainer.occ_state)
    occ["binary"] = np.ones_like(np.asarray(occ["binary"]))
    trainer.occ_state = jax.tree_util.tree_map(jax.numpy.asarray, occ)

    out = trainer.train_step(
        trainer.params, trainer.opt_state, trainer.ctrl, trainer.buffers,
        trainer.device_table, trainer.occ_state["binary"], trainer._key,
    )
    new_params, _, ctrl = out[0], out[1], out[2]
    host_ctrl = jax.device_get(ctrl)
    assert int(host_ctrl["nonfinite_step"]) == 0
    # params frozen at their pre-step values (still the poisoned ones)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            new_params["nerf"]["radiance_field"]["hash"]["table"]
        )),
        table,
    )
    # batch size controller frozen too
    assert int(host_ctrl["batch_size"]) == int(
        jax.device_get(trainer.ctrl)["batch_size"]
    )
    import pytest as _pytest

    with _pytest.raises(FloatingPointError, match="step 0"):
        trainer._check_finite(host_ctrl)


def test_checkpoint_embeds_full_hparams(trained):
    """save_hyperparameters parity (robust_e_nerf.py:162-173): the
    checkpoint carries the full run config + seed, not just the seed."""
    path = trained.save_checkpoint()
    hparams = ckpt_mod.load_hparams(path)
    assert hparams["seed"] == trained.seed
    cfg = hparams["config"]
    assert cfg["model"]["nerf"]["arch"] == trained.config.model.nerf.arch
    assert int(cfg["trainer"]["max_epochs"]) == trained.max_epochs
    assert "data" in cfg and "loss" in cfg


def test_eval_dataset_ratio_trims(dataset, tmp_path_factory):
    """val/test_dataset_ratio semantics (datamodule.py:119-137): float =
    fraction of the eval set, int = that many effective batches."""
    tmp = tmp_path_factory.mktemp("engine_ratio")
    cfg = tiny_config(
        dataset, tmp,
        **{"data.val_dataset_ratio": 0.5,
           "data.test_dataset_ratio": 1,
           "data.test_eff_batch_size": 1},
    )
    trainer = Trainer(cfg, logging_enabled=False)
    assert len(trainer.model.val_stage.img) == 1   # 2 val views * 0.5
    assert len(trainer.model.test_stage.img) == 1  # 1 batch * eff size 1
    assert len(trainer.model.val_stage.sample_id) == 1


def test_multichip_eval_matches_single(dataset, tmp_path_factory):
    """Mesh-sharded eval chunks (make_eval_chunk_fn with a mesh) must give
    the same metrics as the single-chip path."""
    tmp = tmp_path_factory.mktemp("engine_mce")
    cfg1 = tiny_config(dataset, tmp, **{"trainer.limit_train_batches": 1})
    t1 = Trainer(cfg1, logging_enabled=False)
    m1 = t1.run_evaluation("val")

    cfg8 = tiny_config(
        dataset, tmp,
        **{"trainer.gpus": [0, 1, 2, 3, 4, 5, 6, 7],
           "trainer.limit_train_batches": 1},
    )
    t8 = Trainer(cfg8, logging_enabled=False)
    assert t8.num_chips == 8
    # same params/occupancy in both trainers (same seed & init)
    m8 = t8.run_evaluation("val")
    for name in ("val/l1", "val/psnr", "val/ssim"):
        assert abs(m1[name] - m8[name]) < 1e-4, (name, m1[name], m8[name])


def test_checkpoint_monitor_top_k(trained, tmp_path_factory):
    """checkpoint.monitor/mode/save_top_k (run.py:66-70,
    configs/train/synthetic.yaml:135-141): with monitor=val/psnr, mode=max,
    save_top_k=1 only the best-scoring checkpoint survives."""
    tmp = tmp_path_factory.mktemp("ckpt_monitor")
    saved = (
        trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
        trained.ckpt_dirpath, trained._ckpt_records, trained.global_step,
        trained.best_model_path,
    )
    try:
        trained.ckpt_monitor = "val/psnr"
        trained.ckpt_mode = "max"
        trained.ckpt_save_top_k = 1
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        p1 = trained.save_checkpoint({"val/psnr": 10.0})
        trained.global_step += 1
        p2 = trained.save_checkpoint({"val/psnr": 12.0})
        trained.global_step += 1
        p3 = trained.save_checkpoint({"val/psnr": 11.0})
        assert p1 is not None and p2 is not None
        assert p3 is None                  # worse than the kept best
        assert not os.path.isfile(p1)      # evicted by the better p2
        assert os.path.isfile(p2)
        assert trained.best_model_path == p2
        # a missing monitor metric skips the save with a warning
        trained.global_step += 1
        assert trained.save_checkpoint({"val/l1": 0.5}) is None
        # the best.json sidecar (ModelCheckpoint.best_model_path file
        # counterpart) tracks the live ranking for post-hoc tooling
        import json as _json
        with open(os.path.join(str(tmp), "best.json")) as f:
            meta = _json.load(f)
        assert meta["best_model_path"] == p2
        assert meta["monitor"] == "val/psnr" and meta["mode"] == "max"
        assert [r["score"] for r in meta["records"]] == [12.0]
        # bench.py's steady-checkpoint discovery reads the sidecar
        import bench
        fake = tmp / "logs" / "train" / "ngp-64-ref" / "version_0" \
            / "checkpoints"
        fake.mkdir(parents=True)
        with open(fake / "best.json", "w") as f:
            _json.dump(meta, f)
        assert bench.discover_steady_ckpt("ngp", str(tmp)) == p2
        assert bench.discover_steady_ckpt("tensorf", str(tmp)) is None
    finally:
        (trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
         trained.ckpt_dirpath, trained._ckpt_records, trained.global_step,
         trained.best_model_path) = saved


def test_checkpoint_save_last(trained, tmp_path_factory):
    """checkpoint.save_last (ModelCheckpoint(save_last=True), any kwarg of
    the `checkpoint:` block is reference surface via run.py:66-70): a
    `last.npz` tracking the newest state is written at every save cadence,
    even when the monitored metric stopped improving or save_top_k == 0 —
    the resume anchor for watchdog restarts."""
    tmp = tmp_path_factory.mktemp("ckpt_save_last")
    saved = (
        trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
        trained.ckpt_save_last, trained.ckpt_dirpath,
        trained._ckpt_records, trained.global_step,
        trained.best_model_path,
    )
    try:
        trained.ckpt_monitor = "val/psnr"
        trained.ckpt_mode = "max"
        trained.ckpt_save_top_k = 1
        trained.ckpt_save_last = True
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        last = os.path.join(str(tmp), "last.npz")
        p1 = trained.save_checkpoint({"val/psnr": 12.0})
        assert p1 is not None and os.path.isfile(last)
        step1 = ckpt_mod.load_checkpoint_flat(last)["step"]
        # a WORSE epoch skips the ranked save but still refreshes last
        trained.global_step += 7
        assert trained.save_checkpoint({"val/psnr": 10.0}) is None
        flat = ckpt_mod.load_checkpoint_flat(last)
        assert int(flat["step"]) == int(step1) + 7
        assert os.path.isfile(p1)  # ranked best untouched
        assert trained.best_model_path == p1
        # save_top_k == 0 disables ranked saves but not last
        trained.ckpt_save_top_k = 0
        trained.global_step += 1
        assert trained.save_checkpoint({"val/psnr": 99.0}) is None
        assert int(
            ckpt_mod.load_checkpoint_flat(last)["step"]
        ) == int(step1) + 8
    finally:
        (trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
         trained.ckpt_save_last, trained.ckpt_dirpath,
         trained._ckpt_records, trained.global_step,
         trained.best_model_path) = saved


def test_checkpoint_records_restored_on_resume(trained, tmp_path_factory):
    """A watchdog restart must not forget an early-peaked best model:
    Lightning restores ModelCheckpoint state (best_k_models) from the
    checkpoint on resume, so a later save can't displace a better early
    one.  Our ranking persists in best.json; `restore()` reloads it
    (trainer._restore_ckpt_records).  Regression: the round-5 ngp-128 run
    peaked at epoch 1 (val 19.45), the babysitter restarted twice, and
    best.json forgot the peak — post-restart saves ranked only against
    the current attempt's records."""
    tmp = tmp_path_factory.mktemp("ckpt_resume_records")
    saved = (
        trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
        trained.ckpt_dirpath, trained._ckpt_records, trained.global_step,
        trained.best_model_path,
    )
    try:
        trained.ckpt_monitor = "val/psnr"
        trained.ckpt_mode = "max"
        trained.ckpt_save_top_k = 2
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        p_best = trained.save_checkpoint({"val/psnr": 19.45})
        trained.global_step += 1
        p2 = trained.save_checkpoint({"val/psnr": 16.05})
        # simulate a process restart: fresh in-memory ranking state
        trained._ckpt_records = []
        trained.best_model_path = None
        trained._restore_ckpt_records()
        assert trained.best_model_path == p_best
        assert sorted(s for s, _ in trained._ckpt_records) == [16.05, 19.45]
        # a post-restart save ranks against the RESTORED records: a
        # mediocre epoch evicts the worst kept one, never the true best
        trained.global_step += 1
        p3 = trained.save_checkpoint({"val/psnr": 16.10})
        assert p3 is not None and not os.path.isfile(p2)
        assert os.path.isfile(p_best)
        assert trained.best_model_path == p_best
        # records whose files were deleted are dropped on restore
        os.remove(p3)
        trained._ckpt_records = []
        trained.best_model_path = None
        trained._restore_ckpt_records()
        assert [p for _, p in trained._ckpt_records] == [p_best]
        # a monitor change invalidates the stored ranking entirely
        trained.ckpt_monitor = "val/l1"
        trained.ckpt_mode = "min"
        trained._ckpt_records = []
        trained.best_model_path = None
        trained._restore_ckpt_records()
        assert trained._ckpt_records == []
        assert trained.best_model_path is None
    finally:
        (trained.ckpt_monitor, trained.ckpt_mode, trained.ckpt_save_top_k,
         trained.ckpt_dirpath, trained._ckpt_records, trained.global_step,
         trained.best_model_path) = saved


def test_checkpoint_top_k_latest_without_monitor(trained, tmp_path_factory):
    """Without a monitor, save_top_k keeps the LATEST k checkpoints."""
    tmp = tmp_path_factory.mktemp("ckpt_latest")
    saved = (
        trained.ckpt_save_top_k, trained.ckpt_dirpath,
        trained._ckpt_records, trained.global_step,
    )
    try:
        trained.ckpt_save_top_k = 2
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        paths = []
        for _ in range(3):
            paths.append(trained.save_checkpoint())
            trained.global_step += 1
        assert not os.path.isfile(paths[0])  # oldest evicted
        assert os.path.isfile(paths[1]) and os.path.isfile(paths[2])
    finally:
        (trained.ckpt_save_top_k, trained.ckpt_dirpath,
         trained._ckpt_records, trained.global_step) = saved


def test_checkpoint_every_n_epochs(trained, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt_cadence")
    saved = (
        trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
        trained._ckpt_records, trained.current_epoch,
    )
    try:
        trained.ckpt_every_n_epochs = 2
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        trained.current_epoch = 1
        assert trained.save_checkpoint() is None   # off-cadence epoch
        trained.current_epoch = 2
        assert trained.save_checkpoint() is not None
    finally:
        (trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
         trained._ckpt_records, trained.current_epoch) = saved


def test_checkpoint_every_n_epochs_mid_epoch_consistent(trained,
                                                        tmp_path_factory):
    """The every_n_epochs cadence gates on Lightning's (epoch+1) % n rule
    from the `epoch` ARGUMENT, so the mid-epoch call site (which passes
    the in-progress epoch while current_epoch is not yet incremented)
    saves on the same epochs as the end-of-epoch call site — and
    save_last refreshes last.npz even on off-cadence epochs."""
    tmp = tmp_path_factory.mktemp("ckpt_cadence_mid")
    saved = (
        trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
        trained._ckpt_records, trained.current_epoch,
        trained.ckpt_save_last, trained.global_step,
    )
    try:
        trained.ckpt_every_n_epochs = 2
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        trained.ckpt_save_last = True
        # mid-epoch call during epoch 0 (current_epoch == 0): eff = 1
        trained.current_epoch = 0
        assert trained.save_checkpoint(epoch=0) is None
        # ... but last.npz was still refreshed (resume anchor)
        assert os.path.isfile(os.path.join(str(tmp), "last.npz"))
        # mid-epoch call during epoch 1 must agree with the end-of-epoch
        # call after epoch 1 (current_epoch == 2): both save (eff = 2)
        trained.current_epoch = 1
        mid = trained.save_checkpoint(epoch=1)
        assert mid is not None and "epoch=1" in os.path.basename(mid)
        trained.current_epoch = 2
        trained.global_step += 1
        end = trained.save_checkpoint()
        assert end is not None and "epoch=1" in os.path.basename(end)
    finally:
        (trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
         trained._ckpt_records, trained.current_epoch,
         trained.ckpt_save_last, trained.global_step) = saved


def test_checkpoint_save_weights_only(trained, tmp_path_factory):
    """save_weights_only drops the optimizer state; restore() then warns
    and resumes with a fresh optimizer."""
    tmp = tmp_path_factory.mktemp("ckpt_weights_only")
    saved = (
        trained.ckpt_save_weights_only, trained.ckpt_dirpath,
        trained._ckpt_records,
    )
    try:
        trained.ckpt_save_weights_only = True
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        path = trained.save_checkpoint()
        flat = ckpt_mod.load_checkpoint_flat(path)
        assert not any(k.startswith("opt/") for k in flat)
        assert any(k.startswith("params/") for k in flat)
        # restorable: params land, optimizer stays fresh
        params_before = jax.device_get(trained.params)
        restored = ckpt_mod.restore_params(flat, params_before)
        np.testing.assert_array_equal(
            np.asarray(
                restored["nerf"]["radiance_field"]["hash"]["table"]
            ),
            np.asarray(
                params_before["nerf"]["radiance_field"]["hash"]["table"]
            ),
        )
    finally:
        (trained.ckpt_save_weights_only, trained.ckpt_dirpath,
         trained._ckpt_records) = saved


def test_restore_warns_on_hparams_mismatch(trained, tmp_path_factory):
    """Hyperparameter validation on restore (the counterpart of
    Lightning's hparams check, robust_e_nerf.py:162-173)."""
    tmp = tmp_path_factory.mktemp("ckpt_hparams")
    saved_dir = trained.ckpt_dirpath
    saved_records = trained._ckpt_records
    trained.ckpt_dirpath = str(tmp)
    trained._ckpt_records = []
    try:
        path = trained.save_checkpoint()
        flat = ckpt_mod.load_checkpoint_flat(path)
        old = trained.config["model"]["min_modeled_intensity"]
        trained.config["model"]["min_modeled_intensity"] = 123.456
        try:
            mismatches = trained._validate_restore_hparams(flat)
        finally:
            trained.config["model"]["min_modeled_intensity"] = old
        assert any("min_modeled_intensity" in key
                   for key, _, _ in mismatches)
        # matching config -> no mismatches
        assert trained._validate_restore_hparams(flat) == []
    finally:
        trained.ckpt_dirpath = saved_dir
        trained._ckpt_records = saved_records


def test_train_sample_overflow_surfaced(dataset, tmp_path_factory):
    """Training-path sample-buffer overflow must be observable: with a
    deliberately tiny sample budget (capacity = 1.25x budget) and a large
    ray batch, aux['sample_overflow'] counts the dropped marched samples
    (the reference renders every marched sample, external/utils.py:106-129)."""
    tmp = tmp_path_factory.mktemp("engine_overflow")
    cfg = tiny_config(
        dataset, tmp,
        **{"data.train_eff_ray_sample_batch_size": 256,
           "data.train_init_eff_batch_size": 512,
           "data.train_ray_batch_capacity": 1024,
           "trainer.limit_train_batches": 1},
    )
    trainer = Trainer(cfg, logging_enabled=False)
    # fully occupied grid -> every ray marches its whole lattice, far
    # beyond the tiny 1.25 * 256-sample buffer
    occ = jax.device_get(trainer.occ_state)
    occ["binary"] = np.ones_like(np.asarray(occ["binary"]))
    trainer.occ_state = jax.tree_util.tree_map(jax.numpy.asarray, occ)
    out = trainer.train_step(
        trainer.params, trainer.opt_state, trainer.ctrl, trainer.buffers,
        trainer.device_table, trainer.occ_state["binary"], trainer._key,
    )
    aux = jax.device_get(out[4])
    assert float(aux["sample_overflow"]) > 0


def test_pose_batched_eval_matches_per_image(trained):
    """The pose-batched eval pipeline (all images' rays in one chunk
    train) must match the single-image render path per ray (chunk
    regrouping only reorders the sample buffer -> float-tolerance)."""
    from robust_e_nerf_tpu.engine import train as train_mod

    stage = trained.model.val_stage
    outs, totals = train_mod.render_images_dispatch(
        trained.params, trained.buffers, trained.occ_state["binary"],
        trained.spec, trained.eval_chunk_fn, stage.intrinsics_inv,
        stage.img_pixel_pos, stage.T_wc_position,
        stage.T_wc_orientation, num_chips=trained.num_chips,
    )
    batched, _ = train_mod.assemble_images(
        outs, totals, stage.img_pixel_pos, len(stage.img), trained.spec
    )
    for i in range(len(stage.img)):
        single, _ = train_mod.render_image(
            trained.params, trained.buffers, trained.occ_state["binary"],
            trained.spec, trained.eval_chunk_fn, stage.intrinsics_inv,
            stage.img_pixel_pos, stage.T_wc_position[i],
            stage.T_wc_orientation[i], num_chips=trained.num_chips,
        )
        np.testing.assert_allclose(batched[i], single, rtol=1e-4,
                                   atol=1e-5)


def test_distortion_loss_end_to_end(dataset, tmp_path_factory):
    """A training step with the opt-in distortion regularizer enabled
    (loss.weight.distortion > 0) produces a finite loss/distortion aux
    scalar and a finite total loss, including through the jvp grad-loss
    path (the regularizer is computed inside the render that jax.jvp
    traverses)."""
    tmp = tmp_path_factory.mktemp("engine_distortion")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.limit_train_batches": 1,
           "loss.weight.log_intensity_grad": 1.0},
    )
    cfg.loss.weight["distortion"] = 0.001
    cfg.loss.weight["density_sparsity"] = 0.001
    trainer = Trainer(cfg, logging_enabled=False)
    out = trainer.train_step(
        trainer.params, trainer.opt_state, trainer.ctrl, trainer.buffers,
        trainer.device_table, trainer.occ_state["binary"], trainer._key,
    )
    loss = float(jax.device_get(out[3]))
    aux = jax.device_get(out[4])
    assert np.isfinite(loss)
    assert np.isfinite(float(aux["loss/distortion"]))
    assert float(aux["loss/distortion"]) >= 0.0
    assert float(aux["distortion_weight"]) == pytest.approx(0.001)


def test_fused_diff_render_matches_unfused(dataset, tmp_path_factory,
                                           monkeypatch):
    """The opt-in fused interval-endpoint render (REN_FUSE_DIFF=1,
    engine/train.py) is semantically identical to the two-render
    dispatch: with stratified jitter disabled by comparing the loss on
    the SAME params/batch/key, the fused and unfused paths must agree to
    f32 tolerance (the fused path draws per-ray jitter from one key over
    2B rows vs two keys over B rows, so exact bitwise equality is not
    expected -- we check the controller statistics and loss scale
    instead, plus that a fused training step is finite and its
    controller aux matches the unfused formulas)."""
    from robust_e_nerf_tpu.engine import train as train_mod

    tmp = tmp_path_factory.mktemp("engine_fused")
    cfg = tiny_config(dataset, tmp, **{"trainer.limit_train_batches": 1})
    trainer = Trainer(cfg, logging_enabled=False)

    def run_step():
        out = trainer.train_step(
            trainer.params, trainer.opt_state, trainer.ctrl,
            trainer.buffers, trainer.device_table,
            trainer.occ_state["binary"], trainer._key,
        )
        return float(jax.device_get(out[3])), jax.device_get(out[4])

    monkeypatch.setenv("REN_FUSE_DIFF", "0")
    trainer.train_step = train_mod.make_train_step(
        trainer.spec, trainer.optimizer, trainer.mesh,
        trainer.sample_budget, trainer.init_batch_size,
    )
    loss_unfused, aux_unfused = run_step()

    monkeypatch.setenv("REN_FUSE_DIFF", "1")
    trainer.train_step = train_mod.make_train_step(
        trainer.spec, trainer.optimizer, trainer.mesh,
        trainer.sample_budget, trainer.init_batch_size,
    )
    loss_fused, aux_fused = run_step()

    assert np.isfinite(loss_fused)
    # same batch, same initial params: the two paths see identical rays
    # and differ only in marching jitter -> loss and samples/ray agree
    # to a few percent
    assert loss_fused == pytest.approx(loss_unfused, rel=0.05)
    assert float(aux_fused["mean_num_samples_per_ray"]) == pytest.approx(
        float(aux_unfused["mean_num_samples_per_ray"]), rel=0.05
    )
    assert float(aux_fused["mean_marched_per_ray"]) == pytest.approx(
        float(aux_unfused["mean_marched_per_ray"]), rel=0.05
    )


def test_visible_compact_render_matches(dataset, tmp_path_factory,
                                        monkeypatch):
    """The opt-in visibility-compacted render (REN_VISIBLE_COMPACT=1,
    models/nerf.py:_compact_visible) reproduces the plain path: dropped
    samples have transmittance < early_stop_eps, so the rendered
    log-intensities (and hence the loss) agree to ~eps, and the
    controller statistics (visible samples/ray, marched/ray) match.
    This mirrors the reference's non-differentiable sigma_fn marching
    filter (external/utils.py:107-130)."""
    from robust_e_nerf_tpu.engine import train as train_mod

    tmp = tmp_path_factory.mktemp("engine_viscompact")
    cfg = tiny_config(dataset, tmp, **{"trainer.limit_train_batches": 1})
    trainer = Trainer(cfg, logging_enabled=False)

    def run_step():
        out = trainer.train_step(
            trainer.params, trainer.opt_state, trainer.ctrl,
            trainer.buffers, trainer.device_table,
            trainer.occ_state["binary"], trainer._key,
        )
        return float(jax.device_get(out[3])), jax.device_get(out[4])

    monkeypatch.setenv("REN_VISIBLE_COMPACT", "0")
    trainer.train_step = train_mod.make_train_step(
        trainer.spec, trainer.optimizer, trainer.mesh,
        trainer.sample_budget, trainer.init_batch_size,
    )
    loss_plain, aux_plain = run_step()

    monkeypatch.setenv("REN_VISIBLE_COMPACT", "1")
    trainer.train_step = train_mod.make_train_step(
        trainer.spec, trainer.optimizer, trainer.mesh,
        trainer.sample_budget, trainer.init_batch_size,
    )
    loss_vis, aux_vis = run_step()

    assert np.isfinite(loss_vis)
    # same rays, same jitter key: identical sample sets, the only
    # difference is dropping sub-eps-transmittance samples
    assert loss_vis == pytest.approx(loss_plain, rel=1e-3, abs=1e-4)
    assert float(aux_vis["mean_marched_per_ray"]) == pytest.approx(
        float(aux_plain["mean_marched_per_ray"]), rel=1e-6
    )
    assert float(aux_vis["mean_num_samples_per_ray"]) == pytest.approx(
        float(aux_plain["mean_num_samples_per_ray"]), rel=0.02
    )

    # config-key path (model.nerf.visible_compact, no env override):
    # same seed/config => same batch and init params => same loss
    monkeypatch.delenv("REN_VISIBLE_COMPACT", raising=False)
    cfg_key = tiny_config(
        dataset, tmp_path_factory.mktemp("engine_viscfg"),
        **{"trainer.limit_train_batches": 1,
           "model.nerf.visible_compact": True},
    )
    trainer_cfg = Trainer(cfg_key, logging_enabled=False)
    out = trainer_cfg.train_step(
        trainer_cfg.params, trainer_cfg.opt_state, trainer_cfg.ctrl,
        trainer_cfg.buffers, trainer_cfg.device_table,
        trainer_cfg.occ_state["binary"], trainer_cfg._key,
    )
    loss_cfg = float(jax.device_get(out[3]))
    assert loss_cfg == pytest.approx(loss_plain, rel=1e-3, abs=1e-4)


def test_adaptive_compute_config_keys(dataset, tmp_path_factory,
                                      monkeypatch):
    """`model.nerf.visible_compact` / `model.nerf.sample_bucket_levels`
    are config surface (recorded in checkpoint hparams); the REN_* env
    vars override them only when set (A/B without config edits)."""
    from robust_e_nerf_tpu.models import nerf as nerf_mod

    tmp = tmp_path_factory.mktemp("engine_adaptive_keys")
    cfg = tiny_config(
        dataset, tmp,
        **{"model.nerf.visible_compact": True,
           "model.nerf.sample_bucket_levels": 3},
    )
    spec = nerf_mod.build_nerf_spec(
        cfg.model.nerf, aabb=[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
        radiance_dim=1, render_bkgd=None, train_capacity=16384,
    )
    assert spec.visible_compact is True
    assert spec.sample_bucket_levels == 3

    monkeypatch.delenv("REN_VISIBLE_COMPACT", raising=False)
    monkeypatch.delenv("REN_SAMPLE_BUCKETS", raising=False)
    assert nerf_mod._visible_compact_enabled(spec) is True
    # min_bucket=8192 floors the ladder depth below the requested 3
    assert nerf_mod._sample_bucket_ladder(
        16384, spec.sample_bucket_levels
    ) == [8192, 16384]

    monkeypatch.setenv("REN_VISIBLE_COMPACT", "0")
    monkeypatch.setenv("REN_SAMPLE_BUCKETS", "1")
    assert nerf_mod._visible_compact_enabled(spec) is False
    assert nerf_mod._sample_bucket_ladder(
        16384, spec.sample_bucket_levels
    ) == [16384]

    # defaults: absent keys keep the reference-exact path
    cfg_plain = tiny_config(
        dataset, tmp_path_factory.mktemp("engine_adaptive_plain")
    )
    spec_plain = nerf_mod.build_nerf_spec(
        cfg_plain.model.nerf, aabb=[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
        radiance_dim=1, render_bkgd=None, train_capacity=16384,
    )
    assert spec_plain.visible_compact is False
    assert spec_plain.sample_bucket_levels == 1


def test_checkpoint_every_n_epochs_zero_disables(trained, tmp_path_factory):
    """checkpoint.every_n_epochs=0 disables epoch-cadence saving
    (Lightning ModelCheckpoint semantics) instead of crashing with
    ZeroDivisionError."""
    tmp = tmp_path_factory.mktemp("ckpt_zero")
    saved = (trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
             trained._ckpt_records)
    try:
        trained.ckpt_every_n_epochs = 0
        trained.ckpt_dirpath = str(tmp)
        trained._ckpt_records = []
        assert trained.save_checkpoint({"val/psnr": 10.0}) is None
        assert os.listdir(tmp) == []
    finally:
        (trained.ckpt_every_n_epochs, trained.ckpt_dirpath,
         trained._ckpt_records) = saved


def test_monitor_checkpoint_saves_only_on_val_epochs(dataset,
                                                     tmp_path_factory):
    """With checkpoint.monitor set and check_val_every_n_epoch=2, only
    epochs where validation ran write checkpoints — fresh weights never
    inherit a stale score (Lightning saves on validation end)."""
    tmp = tmp_path_factory.mktemp("ckpt_valonly")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.max_epochs": 2,
           "trainer.limit_train_batches": 2,
           "trainer.check_val_every_n_epoch": 2},
    )
    cfg["checkpoint"] = {
        "monitor": "val/psnr", "mode": "max", "save_top_k": -1,
        "every_n_epochs": 1, "dirpath": str(tmp / "ckpts"),
    }
    trainer = Trainer(cfg)
    trainer.fit()
    names = sorted(n for n in os.listdir(str(tmp / "ckpts"))
                   if n.endswith(".npz"))  # best.json ranking sits alongside
    # epoch 1 had no validation -> no checkpoint; epoch 2 validated
    assert names == ["epoch=1-step=4.npz"]


def test_hparams_mismatch_covers_lr_scheduler(trained, tmp_path_factory):
    """Restore-time hparams validation walks the lr_scheduler section, so
    a milestones mismatch is surfaced (robust_e_nerf.py:162-173)."""
    import copy

    import json

    tmp = tmp_path_factory.mktemp("ckpt_lrsched")
    path = os.path.join(str(tmp), "ck.npz")
    hparams = json.loads(json.dumps(
        {"seed": trained.seed, "config": trained.config}, default=str
    ))
    ckpt_mod.save_checkpoint(
        path, jax.device_get(trained.params),
        jax.device_get(trained.opt_state), jax.device_get(trained.occ_state),
        0, 1, hparams=hparams,
    )
    saved_cfg = trained.config
    try:
        cfg2 = copy.deepcopy(dict(trained.config))
        cfg2["lr_scheduler"]["multi_step_lr"]["milestones"] = [1, 2, 3]
        trainer2 = trained
        trainer2.config = cfg2
        flat = ckpt_mod.load_checkpoint_flat(path)
        mismatches = trainer2._validate_restore_hparams(flat)
        keys = [k for k, _, _ in mismatches]
        assert any("milestones" in k for k in keys), keys
    finally:
        trained.config = saved_cfg


def test_val_check_interval_mid_epoch(dataset, tmp_path_factory):
    """trainer.val_check_interval < 1.0 validates mid-epoch: a 0.5
    interval over a 4-batch epoch validates after batches 2 and 4
    (run.py:88-97 plumbs the key into pl.Trainer; every reference config
    uses 1.0 = end-of-epoch only).  Mid-epoch validations feed the
    monitor checkpoint with the in-progress epoch label."""
    tmp = tmp_path_factory.mktemp("vci")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.max_epochs": 1,
           "trainer.limit_train_batches": 4,
           "trainer.val_check_interval": 0.5},
    )
    cfg["checkpoint"] = {
        "monitor": "val/psnr", "mode": "max", "save_top_k": -1,
        "every_n_epochs": 1, "dirpath": str(tmp / "ckpts"),
    }
    trainer = Trainer(cfg)
    assert trainer.val_every_n_steps == 2
    calls = []
    fake_scores = iter([11.0, 12.0])

    def fake_eval(stage_name, save_predictions=None):
        calls.append((trainer.current_epoch, trainer.global_step))
        return {"val/psnr": next(fake_scores)}

    trainer.run_evaluation = fake_eval
    trainer.fit()
    # one mid-epoch validation at step 2, one at epoch end (step 4)
    assert calls == [(0, 2), (1, 4)]
    names = sorted(n for n in os.listdir(str(tmp / "ckpts"))
                   if n.endswith(".npz"))
    assert names == ["epoch=0-step=2.npz", "epoch=0-step=4.npz"]


def test_val_check_interval_int_is_batches(dataset, tmp_path_factory):
    """An int val_check_interval is a fixed batch cadence (Lightning
    semantics), independent of epoch length."""
    tmp = tmp_path_factory.mktemp("vci_int")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.max_epochs": 1,
           "trainer.limit_train_batches": 5,
           "trainer.val_check_interval": 2},
    )
    trainer = Trainer(cfg)
    assert trainer.val_every_n_steps == 2
    calls = []
    trainer.run_evaluation = (
        lambda stage, save_predictions=None:
        calls.append(trainer.global_step) or {"val/psnr": 1.0}
    )
    trainer.fit()
    # mid-epoch at batches 2 and 4, then the end-of-epoch validation
    assert calls == [2, 4, 5]


def test_flush_logs_every_n_steps(dataset, tmp_path_factory):
    """trainer.flush_logs_every_n_steps maps to the TensorBoard writer's
    flush cadence (run.py:88-97): with flush=2 and log_every=1, the
    writer flushes roughly every other step."""
    tmp = tmp_path_factory.mktemp("flush")
    cfg = tiny_config(
        dataset, tmp,
        **{"trainer.max_epochs": 1,
           "trainer.limit_train_batches": 5,
           "trainer.log_every_n_steps": 1,
           "trainer.flush_logs_every_n_steps": 2},
    )
    trainer = Trainer(cfg)
    assert trainer.flush_logs_every_n_steps == 2

    class CountingWriter:
        def __init__(self):
            self.flushes = 0

        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def add_hparams(self, *a, **k):
            pass

        def flush(self):
            self.flushes += 1

    writer = CountingWriter()
    trainer._writer = writer
    trainer.run_evaluation = (
        lambda stage, save_predictions=None: {"val/psnr": 1.0}
    )
    trainer.fit()
    # steps 2 and 4 cross the 2-step flush threshold; the final fit()
    # flush adds one more
    assert writer.flushes >= 3
