"""Worker for the 2-process multi-host smoke test (run by
tests/test_multihost.py, not collected by pytest).

Usage: python multihost_worker.py <process_id> <coordinator_port> <dataset>
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    dataset = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    # generous rendezvous window: the default 30 s Gloo connect window
    # flakes when the machine is under load (full-suite runs alongside a
    # training process) — see tests/test_multihost.py, which also retries
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
        initialization_timeout=180,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2  # one CPU device per process

    from robust_e_nerf_tpu.engine.trainer import Trainer
    from robust_e_nerf_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "configs", "train", "tpu-sphere.yaml")
    )
    cfg["data"]["dataset_directory"] = dataset
    cfg["data"]["train_eff_ray_sample_batch_size"] = 4096
    cfg["data"]["train_init_eff_batch_size"] = 64
    cfg["data"]["train_ray_batch_capacity"] = 256
    cfg["model"]["nerf"]["occ_grid"]["resolution"] = 16
    cfg["model"]["nerf"]["occ_grid"]["warmup_steps"] = 1
    cfg["model"]["nerf"]["eval_sample_capacity"] = 8192
    cfg["model"]["nerf"]["test_chunk_size"] = 128
    cfg["model"]["nerf"]["ngp"]["pos_encoding"]["n_levels"] = 4
    cfg["model"]["nerf"]["ngp"]["pos_encoding"]["log2_hashmap_size"] = 10
    cfg["trainer"]["gpus"] = [0, 1]
    cfg["trainer"]["max_epochs"] = 1
    cfg["trainer"]["limit_train_batches"] = 2
    cfg["trainer"]["logger"] = False
    cfg["trainer"]["checkpoint_callback"] = False

    trainer = Trainer(cfg, logging_enabled=False)
    assert trainer.num_chips == 2
    assert trainer.is_main_process == (process_id == 0)

    trainer.maybe_update_occ_grid()
    out = trainer.train_step(
        trainer.params, trainer.opt_state, trainer.ctrl, trainer.buffers,
        trainer.device_table, trainer.occ_state["binary"], trainer._key,
    )
    params = out[0]
    loss = out[3]

    # parameter checksum must agree across processes after the psum'd step
    import numpy as np
    from jax.experimental import multihost_utils

    flat = jax.tree_util.tree_leaves(params)
    checksum = float(sum(np.float64(np.sum(np.asarray(x))) for x in flat))
    both = multihost_utils.process_allgather(
        jax.numpy.float64(checksum)
    )
    assert both.shape == (2,)
    assert abs(both[0] - both[1]) == 0.0, both

    # host-0-only IO gating: save_checkpoint is a no-op off process 0
    trainer.checkpoint_enabled = True
    path = trainer.save_checkpoint()
    if process_id == 0:
        assert path is not None and os.path.isfile(path)
    else:
        assert path is None

    print(f"MULTIHOST_OK pid={process_id} loss={float(loss):.6f} "
          f"checksum={checksum:.9e}", flush=True)


if __name__ == "__main__":
    main()
