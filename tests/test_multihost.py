"""Multi-host smoke test: 2 CPU processes via jax.distributed.

The TPU-native counterpart of the reference's multi-node DDP surface
(run.py:81-97): a real `jax.distributed.initialize` pair running the full
sharded train step, asserting identical post-step parameters on both
processes (gradient psum) and host-0-only IO gating (run.py:101-123).
"""

import os
import socket
import subprocess
import sys

import pytest

from robust_e_nerf_tpu.data import synthetic


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("multihost"))
    dataset = os.path.join(tmp, "sphere")
    synthetic.generate_dataset(
        dataset, img_width=16, img_height=16, duration_s=1.0,
        num_pose_samples=11, num_sim_frames=21, num_train_views=1,
        num_val_views=1, num_test_views=1,
    )

    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = dict(os.environ)
    # the workers force the CPU backend themselves; scrub any test-harness
    # virtual-device settings so each process owns exactly one CPU device
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "1"

    # under machine load (full suite next to a live training run) the
    # Gloo rendezvous can miss even a generous window — retry with a
    # fresh port before declaring a code defect
    _RENDEZVOUS = ("timed out", "Timed out", "timeout", "Timeout",
                   "DEADLINE_EXCEEDED", "UNAVAILABLE")
    for attempt in range(3):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(port), dataset],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=tmp,
            )
            for pid in range(2)
        ]
        outputs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outputs.append(out)
        ok = all(p.returncode == 0 and "MULTIHOST_OK" in out
                 for p, out in zip(procs, outputs))
        if ok:
            break
        transient = any(sig in out for out in outputs
                        for sig in _RENDEZVOUS)
        if not transient or attempt == 2:
            for pid, (p, out) in enumerate(zip(procs, outputs)):
                assert p.returncode == 0, f"process {pid} failed:\n{out}"
                assert "MULTIHOST_OK" in out, out

    # same loss and checksum on both processes
    def parse(out):
        line = [ln for ln in out.splitlines() if "MULTIHOST_OK" in ln][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        return float(parts["loss"]), float(parts["checksum"])

    loss0, sum0 = parse(outputs[0])
    loss1, sum1 = parse(outputs[1])
    assert loss0 == loss1
    assert sum0 == sum1
