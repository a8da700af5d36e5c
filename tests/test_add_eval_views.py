"""scripts/add_eval_views.py — widen an eval split without disturbing it.

The round-4 verdict's weak #2: quality headlines were scored on 4-view
evals where PSNR/SSIM saturate within ~200 steps.  The widener must
append views deterministically while keeping the original frames (and
thus every committed metric) byte-identical.
"""

import filecmp
import json
import os
import shutil
import subprocess
import sys

import pytest

from robust_e_nerf_tpu.data import posed_images, synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "add_eval_views.py")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("widen")
    synthetic.generate_dataset(
        str(out), img_width=24, img_height=24, duration_s=1.0,
        num_pose_samples=21, num_sim_frames=41, num_train_views=2,
        num_val_views=2, num_test_views=2, elevation_sweep=1.0,
    )
    return str(out)


def run_widener(dataset_dir, num=3, seed=1):
    subprocess.run(
        [sys.executable, SCRIPT, dataset_dir, "--num", str(num),
         "--stages", "val,test", "--seed", str(seed),
         "--elevation-sweep", "1.0"],
        check=True, cwd=REPO, capture_output=True, text=True,
    )


def test_appends_views_and_preserves_originals(dataset, tmp_path):
    work = str(tmp_path / "ds")
    shutil.copytree(dataset, work)
    before = {
        stage: json.load(open(os.path.join(
            work, "views", f"transforms_{stage}.json")))
        for stage in ("val", "test")
    }
    run_widener(work, num=3)
    for stage in ("val", "test"):
        after = json.load(open(os.path.join(
            work, "views", f"transforms_{stage}.json")))
        # original frames untouched, same order, same poses
        assert after["frames"][:2] == before[stage]["frames"]
        assert after["camera_angle_x"] == before[stage]["camera_angle_x"]
        assert len(after["frames"]) == 5
        # original PNGs byte-identical to the pristine dataset's
        for frame in before[stage]["frames"]:
            name = frame["file_path"] + ".png"
            assert filecmp.cmp(
                os.path.join(dataset, "views", name),
                os.path.join(work, "views", name), shallow=False,
            )
        # appended PNGs exist and load through the production pipeline
        imgs = posed_images.load_posed_images(
            work, stage, permutation_seed=None, alpha_over_white_bg=True
        )
        assert imgs["img"].shape[0] == 5


def test_deterministic_across_runs(dataset, tmp_path):
    copies = []
    for i in range(2):
        work = str(tmp_path / f"ds{i}")
        shutil.copytree(dataset, work)
        run_widener(work, num=2, seed=7)
        copies.append(work)
    for stage in ("val", "test"):
        a = open(os.path.join(copies[0], "views",
                              f"transforms_{stage}.json")).read()
        b = open(os.path.join(copies[1], "views",
                              f"transforms_{stage}.json")).read()
        assert a == b
        for j in (2, 3):
            name = f"{stage}_{j:03d}.png"
            assert filecmp.cmp(
                os.path.join(copies[0], "views", name),
                os.path.join(copies[1], "views", name), shallow=False,
            )


def test_seed_changes_appended_views_only(dataset, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    shutil.copytree(dataset, a)
    shutil.copytree(dataset, b)
    run_widener(a, num=2, seed=1)
    run_widener(b, num=2, seed=2)
    ta = json.load(open(os.path.join(a, "views", "transforms_val.json")))
    tb = json.load(open(os.path.join(b, "views", "transforms_val.json")))
    assert ta["frames"][:2] == tb["frames"][:2]
    assert ta["frames"][2:] != tb["frames"][2:]
