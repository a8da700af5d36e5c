"""Evidence-collector scripts: trajectory merge semantics and the TB
calibration round-trip.

These scripts are the repo's evidence pipeline (the driver machine is
recreated between sessions — anything not committed is lost), so their
merge rules are load-bearing: a from-scratch rerun must not inherit
epochs it never produced (ADVICE r4), and the calibration extractor
must reproduce exactly what the trainer logged to TensorBoard
(engine/trainer.py:473-480; reference scalar surface
robust_e_nerf/models/robust_e_nerf.py:489-515).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, cwd):
    # invoke the SCRATCH copy (the scripts resolve their repo root from
    # __file__, so pointing at the real script would write evidence files
    # into the real repo)
    return subprocess.run(
        [sys.executable, os.path.join(cwd, "scripts", script), *args],
        cwd=cwd, capture_output=True, text=True,
    )


def _fake_repo(tmp_path):
    """collect_run_evidence writes relative to the script's repo root;
    run it against a scratch copy of the script tree instead."""
    scratch = tmp_path / "repo"
    (scratch / "scripts").mkdir(parents=True)
    (scratch / "docs" / "diagnostics").mkdir(parents=True)
    (scratch / "robust_e_nerf_tpu" / "engine").mkdir(parents=True)
    for name in ("collect_run_evidence.py", "collect_calibration_trajectory.py"):
        src = open(os.path.join(REPO, "scripts", name)).read()
        (scratch / "scripts" / name).write_text(src)
    (scratch / "robust_e_nerf_tpu" / "__init__.py").write_text("")
    (scratch / "robust_e_nerf_tpu" / "engine" / "__init__.py").write_text("")
    # a stub is enough: these tests never exercise the best-checkpoint
    # copy path (no best.json in the scratch run dir), and the real
    # checkpoint module pulls in the full package
    (scratch / "robust_e_nerf_tpu" / "engine" / "checkpoint.py").write_text(
        "def resolve_checkpoint_path(meta_path):\n"
        "    raise FileNotFoundError(meta_path)\n")
    return scratch


def test_run_evidence_resume_merge_drops_stale_epochs(tmp_path):
    repo = _fake_repo(tmp_path)
    traj = repo / "docs" / "diagnostics" / "tag_val_trajectory.txt"
    traj.write_text(
        "epoch 0 val/psnr 10.0\n"
        "epoch 1 val/psnr 11.0\n"
        "epoch 5 val/psnr 15.0\n"  # stale: from a dead prior run
    )
    log = tmp_path / "stdout.log"
    log.write_text("epoch 2 val/psnr 12.0\nepoch 3 val/psnr 13.0\n")
    r = _run("collect_run_evidence.py", str(log), str(tmp_path / "nolog"),
             "tag", cwd=str(repo))
    assert r.returncode == 0, r.stderr
    got = traj.read_text().splitlines()
    # epochs 0-1 inherited (strictly below the new log's min epoch 2);
    # the stale epoch 5 dropped; new epochs 2-3 present
    assert got == [
        "epoch 0 val/psnr 10.0",
        "epoch 1 val/psnr 11.0",
        "epoch 2 val/psnr 12.0",
        "epoch 3 val/psnr 13.0",
    ]
    # --merge keeps everything
    traj.write_text("epoch 5 val/psnr 15.0\n")
    r = _run("collect_run_evidence.py", str(log), str(tmp_path / "nolog"),
             "tag", "--merge", cwd=str(repo))
    assert r.returncode == 0, r.stderr
    got = traj.read_text().splitlines()
    assert "epoch 5 val/psnr 15.0" in got and "epoch 2 val/psnr 12.0" in got


def test_calibration_trajectory_tb_roundtrip(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    repo = _fake_repo(tmp_path)
    run_dir = tmp_path / "version_0"
    w = SummaryWriter(str(run_dir))
    vals = [(0, 1.05, 1e-6), (20, 1.01, 5e-7), (40, 0.998, 2e-7)]
    for step, ratio, tau in vals:
        w.add_scalar("train/p2n_contrast_threshold_ratio", ratio, step)
        w.add_scalar("train/refractory_period", tau, step)
    w.close()

    r = _run("collect_calibration_trajectory.py", str(run_dir), "jt",
             cwd=str(repo))
    assert r.returncode == 0, r.stderr
    out = repo / "docs" / "diagnostics" / "jt_calibration.txt"
    lines = out.read_text().splitlines()
    assert lines[0].startswith("step ")
    assert len(lines) == 1 + len(vals)
    for (step, ratio, tau), ln in zip(vals, lines[1:]):
        s, r_got, t_got = ln.split()
        assert int(s) == step
        assert abs(float(r_got) - ratio) < 1e-5
        assert abs(float(t_got) - tau) < 1e-9

    # idempotent merge: re-running keeps the same steps (union semantics)
    r = _run("collect_calibration_trajectory.py", str(run_dir), "jt",
             cwd=str(repo))
    assert r.returncode == 0, r.stderr
    assert len(out.read_text().splitlines()) == 1 + len(vals)
