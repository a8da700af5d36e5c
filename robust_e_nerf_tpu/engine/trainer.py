"""Host-side training / evaluation driver.

Replaces the reference's PyTorch-Lightning Trainer usage (run.py:66-128)
with an explicit loop:

  * occupancy-grid updates every `occ_grid.n` steps with a warmup phase
    (host-driven cadence, nerfacc every_n_step semantics);
  * the dynamic batch-size controller: batch_size =
    ray-sample budget / mean samples per ray, applied with a one-step delay
    (the reference's dataloader-prefetch delay, robust_e_nerf.py:907-950) —
    under XLA only the validity mask changes, never the compiled shape;
  * per-epoch validation, checkpointing, TensorBoard logging;
  * full-image evaluation with float64 affine log-intensity alignment and
    L1/PSNR/SSIM/LPIPS metrics (robust_e_nerf.py:589-780).

Multi-host note: parameters/buffers are replicated and every process loads
the same (small) eval image set, so evaluation needs no cross-process
gather (the reference's all_gather at robust_e_nerf.py:591 exists because
Lightning shards the eval dataset); host-side IO (logs, checkpoints,
prediction PNGs) is gated to process 0, mirroring the reference's
`is_global_zero` gating (run.py:101-123).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import pipeline as pipeline_mod
from ..loss_metric import alignment, metric as metric_mod
from ..models import occupancy
from ..parallel import mesh as mesh_mod
from ..utils import tensor_ops
from . import checkpoint as ckpt_mod
from . import model as model_mod
from . import optimizers as opt_mod
from . import train as train_mod

METRICS_FILENAME = "metrics.yaml"
PREDICTIONS_FOLDER_NAME = "predictions"
PREDICTION_BIT_DEPTH = 8


def resolve_log_dir(logger_cfg, version=None):
    """save_dir/name/version_k, auto-incremented like Lightning's
    TensorBoardLogger."""
    base = os.path.join(logger_cfg["save_dir"], logger_cfg["name"])
    if version is None:
        version = logger_cfg.get("version")
    if version is None:
        existing = []
        if os.path.isdir(base):
            for entry in os.listdir(base):
                if entry.startswith("version_"):
                    try:
                        existing.append(int(entry.split("_", 1)[1]))
                    except ValueError:
                        pass
        version = max(existing) + 1 if existing else 0
    return os.path.join(base, f"version_{version}")


class Trainer:
    def __init__(self, config, logging_enabled=True):
        self.config = config
        self.seed = config.get("seed")
        if self.seed is None:
            self.seed = int(np.random.SeedSequence().entropy % (2**31))
        np.random.seed(self.seed % (2**32))

        trainer_cfg = config["trainer"]
        gpus = trainer_cfg.get("gpus")
        requested = (
            int(trainer_cfg.get("num_nodes", 1)) * len(gpus) if gpus else 1
        )
        self.mesh = mesh_mod.make_mesh(
            min(requested, len(jax.devices()))
        )
        self.num_chips = self.mesh.size

        self.model = model_mod.build_model(config, self.seed,
                                           self.num_chips)
        spec = self.model.spec
        self.spec = spec

        # component-wise checkpoint load + freeze (robust_e_nerf.py:265-292)
        load_flags = {
            name: bool(config["model"][name]["load_state_dict"])
            for name in ckpt_mod.MODEL_COMPONENTS
        }
        self._pending_occ_restore = None
        if any(load_flags.values()):
            ckpt_flat = ckpt_mod.load_checkpoint_flat(
                config["model"]["checkpoint_filepath"]
            )
            for component in ckpt_mod.MODEL_COMPONENTS:
                if load_flags[component]:
                    self.model.params = ckpt_mod.restore_component(
                        ckpt_flat, self.model.params, component
                    )
                    print(f'Loaded the state of "{component}" from '
                          'checkpoint!')
            # the occupancy grid is part of the nerf component's state (the
            # reference persists it as nerf.occupancy_grid buffers)
            if load_flags["nerf"]:
                self._pending_occ_restore = ckpt_flat

        # accumulate_grad_batches (robust_e_nerf.py:373-379,924-938): one
        # train_step call is one full accumulation cycle (a lax.scan over
        # micro-batches), so the host loop's step count remains the
        # optimizer-step count, exactly like Lightning's global_step
        self.accumulate_grad_batches = int(
            trainer_cfg.get("accumulate_grad_batches") or 1
        )
        assert self.accumulate_grad_batches >= 1

        steps_per_epoch = int(trainer_cfg["limit_train_batches"])
        self.steps_per_epoch = steps_per_epoch
        self.max_epochs = int(trainer_cfg["max_epochs"])
        self.log_every_n_steps = int(
            trainer_cfg.get("log_every_n_steps", 100)
        )
        self.check_val_every_n_epoch = int(
            trainer_cfg.get("check_val_every_n_epoch", 1)
        )
        # val_check_interval (run.py:88-97 plumbs it into pl.Trainer):
        # a float is the fraction of an epoch between validation runs, an
        # int is a fixed number of train batches — Lightning validates
        # after every `int(limit_train_batches * interval)` batches, so
        # 1.0 (every reference config) degenerates to end-of-epoch only.
        vci = trainer_cfg.get("val_check_interval")
        vci = 1.0 if vci is None else vci
        if isinstance(vci, int) and not isinstance(vci, bool):
            assert vci >= 1, (
                f"val_check_interval must be a positive number of train "
                f"batches when given as an int, got {vci!r}"
            )
            self.val_every_n_steps = int(vci)
        else:
            vci = float(vci)
            assert 0.0 < vci <= 1.0, (
                f"val_check_interval must be an int (batches) or a float "
                f"in (0, 1], got {vci!r}"
            )
            self.val_every_n_steps = max(1, int(steps_per_epoch * vci))
        # flush_logs_every_n_steps: TensorBoard writer flush cadence
        self.flush_logs_every_n_steps = int(
            trainer_cfg.get("flush_logs_every_n_steps", 100)
        )
        self._last_flush_step = 0

        self.optimizer, self.opt_labels = opt_mod.build_optimizer(
            config, self.model.params, self.model.max_refractory_period_s,
            steps_per_epoch,
        )
        self.opt_state = self.optimizer.init(self.model.params)

        # jitted step functions are built after the event table exists
        self.train_step = None
        self.occ_update_warmup = train_mod.make_occ_update(spec, True)
        self.occ_update_sampled = train_mod.make_occ_update(spec, False)
        self.eval_chunk_fn = train_mod.make_eval_chunk_fn(spec, self.mesh)

        self.occ_state = occupancy.init_state(spec.nerf.occ)
        if self._pending_occ_restore is not None:
            self.occ_state = ckpt_mod.restore_occ_state(
                self._pending_occ_restore, jax.device_get(self.occ_state)
            )
            self.occ_state = jax.tree_util.tree_map(
                jax.numpy.asarray, self.occ_state
            )
            self._pending_occ_restore = None
        self.global_step = 0
        self.current_epoch = 0

        # training data pipeline: the event table lives on device and the
        # jitted step samples batches from it (zero per-step host traffic)
        data_cfg = config["data"]
        events = self.model.events
        subset = pipeline_mod.trim_length(
            len(events["position"]), data_cfg["train_dataset_ratio"],
            int(data_cfg["train_init_eff_batch_size"]),
        )
        events = {k: np.asarray(v)[:subset] for k, v in events.items()}
        self.global_batch_capacity = spec.batch_capacity * self.num_chips
        self.event_table = pipeline_mod.build_event_table(
            events, self.model.t0_ns, spec.has_bayer
        )
        self.init_batch_size = min(
            int(data_cfg["train_init_eff_batch_size"]),
            self.global_batch_capacity,
        )
        self.sample_budget = int(
            data_cfg["train_eff_ray_sample_batch_size"]
        )

        # logging
        self.logging_enabled = logging_enabled and bool(
            trainer_cfg.get("logger", True)
        )
        self.checkpoint_enabled = bool(
            trainer_cfg.get("checkpoint_callback", True)
        )
        self.log_dir = resolve_log_dir(config["logger"])
        self._writer = None

        # ModelCheckpoint semantics (run.py:66-70 constructs
        # `pl.callbacks.ModelCheckpoint(**config.checkpoint)`, keys at
        # configs/train/synthetic.yaml:135-141): monitor/mode select which
        # metric ranks checkpoints, save_top_k bounds how many are kept
        # (best-k with a monitor, latest-k without), every_n_epochs sets the
        # cadence, save_weights_only drops the optimizer state, dirpath
        # overrides <log_dir>/checkpoints
        ckpt_cfg = dict(config.get("checkpoint") or {})
        self.ckpt_dirpath = ckpt_cfg.get("dirpath") or None
        self.ckpt_monitor = ckpt_cfg.get("monitor") or None
        self.ckpt_mode = str(ckpt_cfg.get("mode") or "min")
        assert self.ckpt_mode in ("min", "max")
        save_top_k = ckpt_cfg.get("save_top_k")
        self.ckpt_save_top_k = 1 if save_top_k is None else int(save_top_k)
        self.ckpt_save_weights_only = bool(
            ckpt_cfg.get("save_weights_only") or False
        )
        every_n = ckpt_cfg.get("every_n_epochs")
        self.ckpt_every_n_epochs = 1 if every_n is None else int(every_n)
        # save_last mirrors ModelCheckpoint(save_last=True): an
        # always-current `last.npz` written at every save cadence,
        # independent of the monitor ranking — the resume anchor for
        # watchdog restarts when the monitored metric peaked early
        self.ckpt_save_last = bool(ckpt_cfg.get("save_last") or False)
        # (score-or-None, path) per kept checkpoint, in save order
        self._ckpt_records = []
        self._last_val_metrics = None
        self.best_model_path = None

        self._key = jax.random.PRNGKey(self.seed)

        # replicate device constants & params once
        self.buffers = mesh_mod.put_replicated(self.model.buffers,
                                               self.mesh)
        self.params = mesh_mod.put_replicated(self.model.params, self.mesh)
        self.opt_state = mesh_mod.put_replicated(self.opt_state, self.mesh)
        self.device_table = mesh_mod.put_replicated(
            {k: np.asarray(v) for k, v in self.event_table.items()},
            self.mesh,
        )
        self.train_step = train_mod.make_train_step(
            spec, self.optimizer, self.mesh,
            self.sample_budget, self.init_batch_size,
            accum_steps=self.accumulate_grad_batches,
            frozen_components=tuple(
                name for name in
                ("contrast_threshold", "refractory_period", "nerf")
                if bool(config["model"][name]["freeze"])
            ),
        )
        self.ctrl = train_mod.init_controller_state(self.init_batch_size)
        self.ctrl = mesh_mod.put_replicated(self.ctrl, self.mesh)

        resume = trainer_cfg.get("resume_from_checkpoint")
        if resume:
            self.restore(resume)

    # ------------------------------------------------------------------
    # logging
    # ------------------------------------------------------------------

    @property
    def is_main_process(self):
        return jax.process_index() == 0

    @property
    def writer(self):
        if (
            self._writer is None
            and self.logging_enabled
            and self.is_main_process
        ):
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = SummaryWriter(self.log_dir)
        return self._writer

    def log_scalar(self, name, value, step=None):
        if self.writer is not None:
            self.writer.add_scalar(
                name, float(value),
                self.global_step if step is None else step,
            )

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def step_key(self):
        return jax.random.fold_in(self._key, self.global_step)

    def maybe_update_occ_grid(self):
        spec = self.spec.nerf.occ
        if self.global_step % spec.update_interval != 0:
            return
        key = jax.random.fold_in(self.step_key(), 0x0CC)
        if self.global_step < spec.warmup_steps:
            fn = self.occ_update_warmup
        else:
            fn = self.occ_update_sampled
        self.occ_state = fn(self.params, self.buffers, self.occ_state, key)

    def fit(self):
        # optional profiler capture (SURVEY.md section 5.1: the reference has
        # TensorBoard scalars only; we add jax.profiler traces on request)
        profile_dir = os.environ.get("REN_PROFILE_DIR")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            return self._fit_loop()
        finally:
            if profile_dir:
                jax.profiler.stop_trace()

    def _register_hp_metrics(self):
        """hp-metric registration at train start (robust_e_nerf.py:834-847):
        declare the tracked metrics and their worst-case initial values so
        TensorBoard's HParams tab knows the tuning directions."""
        if self.writer is None:
            return
        hparams = json.loads(json.dumps(
            {"seed": self.seed, "config": self.config}, default=str
        ))
        flat = {}

        def _flatten(node, prefix=""):
            if isinstance(node, dict):
                for k, v in node.items():
                    _flatten(v, f"{prefix}{k}/")
            elif isinstance(node, (int, float, str, bool)) or node is None:
                flat[prefix[:-1]] = "" if node is None else node
            else:
                flat[prefix[:-1]] = str(node)

        _flatten(hparams)
        self.writer.add_hparams(
            flat,
            {
                "val/l1": float("inf"),
                "val/psnr": float("-inf"),
                "val/ssim": -1.0,
                "val/lpips": float("inf"),
            },
            run_name=".",
        )

    def _fit_loop(self):
        t_start = time.time()
        self._register_hp_metrics()
        while self.current_epoch < self.max_epochs:
            epoch_validates = (
                (self.current_epoch + 1) % self.check_val_every_n_epoch == 0
            )
            for batch_idx in range(self.steps_per_epoch):
                self.maybe_update_occ_grid()
                (
                    self.params, self.opt_state, self.ctrl, loss, aux
                ) = self.train_step(
                    self.params, self.opt_state, self.ctrl, self.buffers,
                    self.device_table, self.occ_state["binary"], self._key,
                )
                if self.global_step % self.log_every_n_steps == 0:
                    self.log_training_scalars(aux, t_start)
                self.global_step += 1
                # mid-epoch validation (val_check_interval < 1.0 or int):
                # the end-of-epoch boundary is handled below so it also
                # runs when steps_per_epoch is not a multiple
                if (
                    epoch_validates
                    and batch_idx + 1 < self.steps_per_epoch
                    and (batch_idx + 1) % self.val_every_n_steps == 0
                ):
                    self._check_finite(jax.device_get(self.ctrl))
                    metrics = self.run_evaluation("val")
                    self._last_val_metrics = metrics
                    print(
                        f"epoch {self.current_epoch} "
                        f"step {self.global_step} "
                        + " ".join(
                            f"{k}={v:.4f}" for k, v in metrics.items()
                            if v is not None
                        ),
                        flush=True,
                    )
                    # save on every validation end like Lightning's
                    # ModelCheckpoint — the monitor-less path keeps the
                    # latest k, the monitored path ranks by the metric,
                    # and save_last refreshes last.npz either way
                    if self.checkpoint_enabled:
                        self.save_checkpoint(metrics,
                                             epoch=self.current_epoch)

            self._check_finite(jax.device_get(self.ctrl))
            self.current_epoch += 1
            val_ran = epoch_validates
            if val_ran:
                metrics = self.run_evaluation("val")
                self._last_val_metrics = metrics
                print(
                    f"epoch {self.current_epoch} "
                    + " ".join(
                        f"{k}={v:.4f}" for k, v in metrics.items()
                        if v is not None
                    ),
                    flush=True,
                )
            # Monitor-based checkpointing saves only on epochs where
            # validation actually ran — Lightning's ModelCheckpoint saves
            # on validation end, and attaching a stale score to fresh
            # (unvalidated) weights would let them occupy a top-k slot on
            # a score they never achieved.  Without a monitor, keep-latest
            # saves every (every_n_epochs-th) epoch as before.
            if self.checkpoint_enabled and (
                self.ckpt_monitor is None or val_ran
            ):
                self.save_checkpoint(self._last_val_metrics)
        elapsed = time.time() - t_start
        if self.writer is not None:
            self.writer.flush()
        return elapsed

    def _check_finite(self, host_state):
        """terminate_on_nan (run.py:94): the train step records the first
        optimizer step whose loss went non-finite and freezes all state
        from that step on (engine/train.py), so raising at the next host
        fetch terminates with zero poisoned optimizer steps — without any
        per-step host sync."""
        offending = int(host_state.get("nonfinite_step", -1))
        if offending >= 0:
            raise FloatingPointError(
                f"non-finite training loss at step {offending}; parameters "
                "were frozen at the last finite step"
            )

    def log_training_scalars(self, aux, t_start):
        """One host sync per log interval: fetch the aux dict, print a
        progress line, forward scalars to TensorBoard
        (robust_e_nerf.py:489-515)."""
        host_aux = jax.device_get(aux)
        self._check_finite(host_aux)
        loss = float(host_aux["loss/total"])
        batch_size = int(host_aux["batch_size"])
        rate = (self.global_step + 1) / max(time.time() - t_start, 1e-9)
        print(
            f"epoch {self.current_epoch} step {self.global_step} "
            f"loss {loss:.5f} batch {batch_size} samples/ray "
            f"{float(host_aux['mean_num_samples_per_ray']):.1f} "
            f"({rate:.2f} steps/s)",
            flush=True,
        )
        if self.writer is None:
            return
        self.log_scalar("train/loss", loss)
        for name in ("log_intensity_grad", "log_intensity_diff",
                     "density_sparsity", "distortion"):
            if f"loss/{name}" in host_aux:
                self.log_scalar(f"train/{name}", host_aux[f"loss/{name}"])
        for name in ("density_sparsity_weight", "distortion_weight"):
            if name in host_aux:
                self.log_scalar(f"train/{name}", host_aux[name])
        if not self.config["model"]["contrast_threshold"]["freeze"]:
            self.log_scalar(
                "train/p2n_contrast_threshold_ratio",
                host_aux["p2n_contrast_threshold_ratio"],
            )
        if not self.config["model"]["refractory_period"]["freeze"]:
            self.log_scalar("train/refractory_period",
                            host_aux["refractory_period"])
        overflow = float(host_aux.get("sample_overflow", 0))
        if overflow > 0:
            print(
                f"WARNING: train sample-buffer overflow ({overflow:.0f} "
                "marched samples dropped this step) — the batch exceeded "
                "the 1.25x train_eff_ray_sample_batch_size buffer; the "
                "controller will shrink the batch next step",
                flush=True,
            )
        self.log_scalar("train/sample_overflow", overflow)
        self.log_scalar("train/batch_size", batch_size)
        self.log_scalar("train/mean_num_samples_per_ray",
                        host_aux["mean_num_samples_per_ray"])
        self.log_scalar("train/mean_ray_occ_rate",
                        host_aux["mean_ray_occ_rate"])
        self.log_scalar("train/mean_valid_rate",
                        host_aux["mean_valid_rate"])
        # occupancy-grid health (beyond the reference's scalar set): the
        # NGP fog-densification failure mode announces itself as a rising
        # occs mean together with a falling samples/ray (docs/ROADMAP.md
        # round-2 findings) — cheap to log, invaluable to catch early
        occ = jax.device_get({
            "frac": jnp.mean(
                self.occ_state["binary"].astype(jnp.float32)
            ),
            "mean": jnp.mean(self.occ_state["occs"]),
        })
        self.log_scalar("train/occ_grid_occupied_frac", occ["frac"])
        self.log_scalar("train/occ_grid_mean", occ["mean"])
        # flush_logs_every_n_steps (run.py:88-97): bound how stale the
        # on-disk event file can get during long epochs
        if (
            self.global_step - self._last_flush_step
            >= self.flush_logs_every_n_steps
        ):
            self.writer.flush()
            self._last_flush_step = self.global_step

    # ------------------------------------------------------------------
    # evaluation (robust_e_nerf.py:519-780)
    # ------------------------------------------------------------------

    def run_evaluation(self, stage_name, save_predictions=None):
        stage = (
            self.model.val_stage if stage_name == "val"
            else self.model.test_stage
        )
        assert stage is not None, f"no {stage_name} images available"
        if save_predictions is None:
            save_predictions = bool(
                self.config["model"]["eval_save_pred_intensity_img"]
            ) and stage_name == "test"

        # pose-batched render: ALL images' rays concatenate into one
        # chunk train with per-ray poses (chunks span pose boundaries),
        # dispatched asynchronously with a single fetch wave at the end —
        # over the high-latency device link the pipelining matters more
        # than the per-chunk compute (round-2 VERDICT weak #6)
        outs, totals = train_mod.render_images_dispatch(
            self.params, self.buffers, self.occ_state["binary"],
            self.spec, self.eval_chunk_fn, stage.intrinsics_inv,
            stage.img_pixel_pos, stage.T_wc_position,
            stage.T_wc_orientation, num_chips=self.num_chips,
        )
        pred, total_overflow = train_mod.assemble_images(
            outs, totals, stage.img_pixel_pos, len(stage.img), self.spec
        )
        if total_overflow:
            print(f"WARNING: eval sample-buffer overflow "
                  f"({total_overflow} samples dropped) — raise "
                  f"model.nerf.eval_sample_capacity")
        pred = np.moveaxis(pred, -1, 1)  # (N, C, H, W)

        target = np.asarray(stage.img)
        if target.ndim == 3:  # monochrome -> (N, 1, H, W)
            target = target[:, None]

        # float64 affine alignment of log intensities
        # (robust_e_nerf.py:639-677)
        aligned_log, _ = alignment.align_log_intensities(
            np.log(pred), np.log(target)
        )
        pred_aligned = np.exp(aligned_log).astype(np.float32)

        per_sample = {name: [] for name in metric_mod.METRIC_NAMES}
        lpips_fn = self._lpips_fn()
        for i in range(len(target)):
            sample_metrics = metric_mod.compute_metrics(
                pred_aligned[i], target[i],
                stage.min_normalized_pixel_value,
                stage.max_normalized_pixel_value, lpips_fn,
            )
            for name, value in sample_metrics.items():
                per_sample[name].append(value)
        metrics = {}
        for name, values in per_sample.items():
            if any(v is None for v in values):
                metrics[f"{stage_name}/{name}"] = None
            else:
                metrics[f"{stage_name}/{name}"] = float(np.mean(values))

        if self.writer is not None:
            for name, value in metrics.items():
                if value is not None:
                    self.log_scalar(name, value)
            first = tensor_ops.normalize_range(
                pred_aligned[0], stage.min_normalized_pixel_value,
                stage.max_normalized_pixel_value,
            )
            self.writer.add_image(
                f"{stage_name}/pred_intensity_img",
                np.clip(np.asarray(first), 0, 1), self.global_step,
            )
            if self.current_epoch == 0:
                self.writer.add_image(
                    f"{stage_name}/target_intensity_img",
                    np.asarray(tensor_ops.normalize_range(
                        target[0], stage.min_normalized_pixel_value,
                        stage.max_normalized_pixel_value,
                    )),
                    self.global_step,
                )

        if save_predictions:
            self.save_prediction_images(stage, stage_name, pred_aligned)
        return metrics

    def _lpips_fn(self):
        from ..loss_metric import lpips_jax

        return lpips_jax.get_lpips_fn(
            self.config["metric"]["lpips_net"]
        )

    def save_prediction_images(self, stage, stage_name, pred_aligned):
        """8-bit normalized PNG dumps (robust_e_nerf.py:735-780)."""
        if not self.is_main_process:
            return
        import cv2

        folder = os.path.join(self.log_dir, PREDICTIONS_FOLDER_NAME)
        os.makedirs(folder, exist_ok=True)
        # 8- or 16-bit normalized quantization (robust_e_nerf.py:739-758)
        max_pixel = 2**PREDICTION_BIT_DEPTH - 1
        out_dtype = {8: np.uint8, 16: np.uint16}[PREDICTION_BIT_DEPTH]
        imgs = tensor_ops.normalize_range(
            pred_aligned, stage.min_normalized_pixel_value,
            stage.max_normalized_pixel_value,
        )
        imgs = np.clip(np.asarray(imgs), 0, 1)
        imgs = np.round(max_pixel * imgs).astype(out_dtype)
        imgs = imgs.transpose(0, 2, 3, 1)  # (N, H, W, C)
        for sample_id, img in zip(stage.sample_id, imgs):
            if img.shape[-1] == 3:
                img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(folder, sample_id + ".png"), img)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def _is_better(self, score, reference):
        if self.ckpt_mode == "max":
            return score > reference
        return score < reference

    def save_checkpoint(self, metrics=None, epoch=None):
        """Save a checkpoint honoring the `checkpoint:` config block
        (ModelCheckpoint semantics, run.py:66-70).

        With `monitor` set, the checkpoint is ranked by that metric from
        the most recent validation; only the best `save_top_k` are kept
        (the rest are deleted), so e.g. `monitor: val/psnr, mode: max`
        retains the peak-quality model instead of the last one.  Without a
        monitor, the latest `save_top_k` checkpoints are kept.

        `epoch` labels the checkpoint filename; it defaults to the just-
        finished epoch (`current_epoch - 1`, the end-of-epoch call site) —
        mid-epoch validation passes the in-progress epoch explicitly.
        The every_n_epochs cadence gates on `epoch + 1`, Lightning's
        `(current_epoch + 1) % every_n != 0` skip rule, so mid-epoch and
        end-of-epoch call sites agree on which epochs save.
        """
        if epoch is None:
            epoch = self.current_epoch - 1
        if not self.is_main_process:
            return None
        folder = self.ckpt_dirpath or os.path.join(
            self.log_dir, "checkpoints"
        )
        # full hyperparameters, like Lightning's save_hyperparameters
        # (robust_e_nerf.py:162-173, datamodule.py:56-60): the entire run
        # config plus the resolved seed
        hparams = json.loads(json.dumps(
            {"seed": self.seed, "config": self.config}, default=str
        ))

        def _write(p):
            ckpt_mod.save_checkpoint(
                p, jax.device_get(self.params),
                None if self.ckpt_save_weights_only
                else jax.device_get(self.opt_state),
                jax.device_get(self.occ_state), self.global_step,
                int(jax.device_get(self.ctrl)["batch_size"]),
                hparams=hparams,
            )

        # `last.npz` is written before any cadence or monitor-based skip:
        # Lightning's save_last refreshes the last checkpoint on every
        # save opportunity regardless of every_n_epochs / save_top_k, so
        # it stays a valid resume anchor for watchdog restarts
        if self.ckpt_save_last:
            _write(os.path.join(folder, "last.npz"))
        # every_n_epochs == 0 disables epoch-cadence saving entirely
        # (Lightning's ModelCheckpoint semantics)
        if self.ckpt_every_n_epochs == 0:
            return None
        if (epoch + 1) % self.ckpt_every_n_epochs != 0:
            return None
        if self.ckpt_save_top_k == 0:
            return None
        score = None
        if self.ckpt_monitor is not None:
            if metrics is None:
                metrics = self._last_val_metrics
            score = (metrics or {}).get(self.ckpt_monitor)
            if score is None:
                print(
                    f"WARNING: checkpoint.monitor="
                    f"{self.ckpt_monitor!r} was not found in the logged "
                    "metrics; skipping checkpoint"
                )
                return None
            score = float(score)
            if (
                self.ckpt_save_top_k > 0
                and len(self._ckpt_records) >= self.ckpt_save_top_k
            ):
                # the record a new checkpoint must beat: the worst kept one
                if self.ckpt_mode == "max":
                    worst = min(self._ckpt_records, key=lambda r: r[0])
                else:
                    worst = max(self._ckpt_records, key=lambda r: r[0])
                if not self._is_better(score, worst[0]):
                    return None
        path = os.path.join(
            folder,
            f"epoch={epoch}-step={self.global_step}.npz",
        )
        _write(path)
        self._ckpt_records.append((score, path))
        if (
            self.ckpt_save_top_k > 0
            and len(self._ckpt_records) > self.ckpt_save_top_k
        ):
            if self.ckpt_monitor is None:
                drop = self._ckpt_records.pop(0)  # keep the latest k
            else:
                key = (lambda r: r[0]) if self.ckpt_mode == "max" \
                    else (lambda r: -r[0])
                drop = min(self._ckpt_records, key=key)
                self._ckpt_records.remove(drop)
            if drop[1] != path and os.path.isfile(drop[1]):
                os.remove(drop[1])
        if self.ckpt_monitor is not None and self._ckpt_records:
            key = (lambda r: r[0]) if self.ckpt_mode == "min" \
                else (lambda r: -r[0])
            self.best_model_path = min(self._ckpt_records, key=key)[1]
        else:
            self.best_model_path = self._ckpt_records[-1][1] \
                if self._ckpt_records else None
        # persist the ranking so post-hoc tooling (`run.py test` from the
        # best model, bench.py steady entries) can find the best checkpoint
        # without the live Trainer — the file counterpart of Lightning's
        # ModelCheckpoint.best_model_path attribute
        try:
            with open(os.path.join(folder, "best.json"), "w") as f:
                json.dump({
                    "monitor": self.ckpt_monitor,
                    "mode": self.ckpt_mode,
                    "best_model_path": self.best_model_path,
                    "records": [
                        {"score": s, "path": p}
                        for s, p in self._ckpt_records
                    ],
                }, f, indent=1)
        except OSError:
            pass
        return path if any(p == path for _, p in self._ckpt_records) \
            else None

    def _validate_restore_hparams(self, flat):
        """Warn when the checkpoint's stored hyperparameters disagree with
        the active config (the counterpart of Lightning's hparams check on
        restore, robust_e_nerf.py:162-173).  Differences in run plumbing
        (logger paths, checkpoint/load flags, resume path) are expected and
        ignored; differences in model/loss/optimizer/data hyperparameters
        are surfaced."""
        try:
            stored = ckpt_mod.load_hparams(flat)
        except Exception:
            return []
        stored_cfg = (stored or {}).get("config")
        if not stored_cfg:
            return []
        active = json.loads(json.dumps(self.config, default=str))
        skip_keys = {
            "checkpoint_filepath", "load_state_dict", "freeze",
            "resume_from_checkpoint", "dataset_directory", "save_dir",
            "version", "dirpath",
        }
        mismatches = []

        def walk(a, b, prefix):
            if isinstance(a, dict) and isinstance(b, dict):
                for k in sorted(set(a) & set(b)):
                    if k in skip_keys:
                        continue
                    walk(a[k], b[k], f"{prefix}{k}.")
            elif a != b and str(a) != str(b):
                mismatches.append((prefix[:-1], a, b))

        for section in ("model", "loss", "metric", "data", "optimizer",
                        "lr_scheduler"):
            if section in stored_cfg and section in active:
                walk(stored_cfg[section], active[section], f"{section}.")
        for key, stored_v, active_v in mismatches:
            print(
                f"WARNING: checkpoint hyperparameter {key!r} = "
                f"{stored_v!r} differs from the active config's "
                f"{active_v!r}"
            )
        return mismatches

    def _restore_ckpt_records(self):
        """Reload the checkpoint ranking from `best.json` on resume.

        Lightning restores ModelCheckpoint callback state (best_k_models,
        best_model_path) from the checkpoint itself, so a watchdog restart
        never forgets an early-peaked best model.  Our ranking lives in
        best.json (save_checkpoint); seed `_ckpt_records` from it, keeping
        only entries whose files still exist and whose monitor/mode match
        the active config (a monitor change invalidates old scores)."""
        folder = self.ckpt_dirpath or os.path.join(
            self.log_dir, "checkpoints"
        )
        best_path = os.path.join(folder, "best.json")
        if not os.path.isfile(best_path):
            return
        try:
            with open(best_path) as f:
                stored = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        if (
            stored.get("monitor") != self.ckpt_monitor
            or stored.get("mode") != self.ckpt_mode
        ):
            print(
                "WARNING: best.json monitor/mode "
                f"({stored.get('monitor')!r}/{stored.get('mode')!r}) does "
                f"not match the active config ({self.ckpt_monitor!r}/"
                f"{self.ckpt_mode!r}); discarding the stored ranking"
            )
            return
        for rec in stored.get("records") or []:
            p = rec.get("path")
            if p and os.path.isfile(p):
                s = rec.get("score")
                self._ckpt_records.append(
                    (None if s is None else float(s), p)
                )
        if self._ckpt_records:
            if self.ckpt_monitor is not None:
                key = (lambda r: r[0]) if self.ckpt_mode == "min" \
                    else (lambda r: -r[0])
                self.best_model_path = min(self._ckpt_records, key=key)[1]
            else:
                self.best_model_path = self._ckpt_records[-1][1]

    def restore(self, path):
        flat = ckpt_mod.load_checkpoint_flat(path)
        self._validate_restore_hparams(flat)
        self._restore_ckpt_records()
        host_params = jax.device_get(self.params)
        host_opt = jax.device_get(self.opt_state)
        host_occ = jax.device_get(self.occ_state)
        self.params = mesh_mod.put_replicated(
            ckpt_mod.restore_params(flat, host_params), self.mesh
        )
        if any(k.startswith("opt/") for k in flat):
            self.opt_state = mesh_mod.put_replicated(
                ckpt_mod.restore_opt_state(flat, host_opt), self.mesh
            )
        else:
            print(
                "WARNING: checkpoint has no optimizer state "
                "(save_weights_only); resuming with a fresh optimizer"
            )
        self.occ_state = ckpt_mod.restore_occ_state(flat, host_occ)
        self.global_step = int(flat["step"])
        self.current_epoch = self.global_step // self.steps_per_epoch
        self.ctrl = mesh_mod.put_replicated(
            {
                "step": np.int32(self.global_step),
                "batch_size": np.int32(flat["batch_size"]),
                "nonfinite_step": np.int32(-1),
            },
            self.mesh,
        )
