"""The real CLI surface, run as a subprocess (train then test)."""

import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_cli(stage, config_path, env):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run.py"), stage,
         config_path],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=540,
    )


def test_cli_train_then_test(tmp_path):
    from robust_e_nerf_tpu.data import synthetic

    dataset = str(tmp_path / "ds")
    synthetic.generate_dataset(
        dataset, img_width=16, img_height=16, duration_s=1.0,
        num_pose_samples=11, num_sim_frames=21, num_train_views=1,
        num_val_views=1, num_test_views=1,
    )
    cfg = yaml.safe_load(
        open(os.path.join(REPO, "configs", "train", "tpu-sphere.yaml"))
    )
    cfg["data"]["dataset_directory"] = dataset
    cfg["data"]["train_eff_ray_sample_batch_size"] = 4096
    cfg["data"]["train_init_eff_batch_size"] = 64
    cfg["data"]["train_ray_batch_capacity"] = 256
    cfg["model"]["nerf"]["occ_grid"]["resolution"] = 16
    cfg["model"]["nerf"]["occ_grid"]["warmup_steps"] = 2
    cfg["model"]["nerf"]["eval_sample_capacity"] = 4096
    cfg["model"]["nerf"]["test_chunk_size"] = 128
    cfg["model"]["nerf"]["ngp"]["pos_encoding"]["n_levels"] = 2
    cfg["model"]["nerf"]["ngp"]["pos_encoding"]["log2_hashmap_size"] = 10
    cfg["trainer"]["max_epochs"] = 1
    cfg["trainer"]["limit_train_batches"] = 3
    cfg["trainer"]["log_every_n_steps"] = 1
    cfg["logger"]["save_dir"] = str(tmp_path / "logs")
    cfg["logger"]["name"] = "cli-smoke"
    train_cfg = tmp_path / "train.yaml"
    yaml.safe_dump(cfg, open(train_cfg, "w"), sort_keys=False)

    env = dict(os.environ)
    env["REN_PLATFORM"] = "cpu"  # honored by run.py before backend init
    env["REN_TPU_COMPILE_CACHE"] = "/tmp/jax_test_cache"

    result = run_cli("train", str(train_cfg), env)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "epoch 0 step 0" in result.stdout

    version_dir = tmp_path / "logs" / "cli-smoke" / "version_0"
    ckpts = list((version_dir / "checkpoints").glob("*.npz"))
    assert len(ckpts) == 1
    assert (version_dir / "train.yaml").exists()  # config snapshot

    cfg["model"]["checkpoint_filepath"] = str(ckpts[0])
    for comp in ("contrast_threshold", "refractory_period", "nerf"):
        cfg["model"][comp]["load_state_dict"] = True
    test_cfg = tmp_path / "test.yaml"
    yaml.safe_dump(cfg, open(test_cfg, "w"), sort_keys=False)

    result = run_cli("test", str(test_cfg), env)
    assert result.returncode == 0, result.stderr[-2000:]
    metrics_files = list(
        (tmp_path / "logs" / "cli-smoke").glob("version_*/metrics.yaml")
    )
    assert metrics_files, "metrics.yaml not written"
    metrics = yaml.safe_load(open(metrics_files[0]))
    assert np.isfinite(metrics[0]["test/psnr"])


def test_cli_rejects_bad_stage():
    env = dict(os.environ)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run.py"),
         "evaluate", "x.yaml"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert result.returncode != 0
    assert "invalid choice" in result.stderr
