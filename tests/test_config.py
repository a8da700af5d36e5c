"""Config loading: DotDict semantics + reference YAML schema round trip."""

import os

import pytest
import yaml

from robust_e_nerf_tpu.utils.config import DotDict, load_config, save_config

CONFIGS_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_dotdict_access():
    d = DotDict({"a": {"b": [1, {"c": 2}]}, "x": None})
    assert d.a.b[1].c == 2
    assert d.x is None
    d.a.b[1].c = 3
    assert d["a"]["b"][1]["c"] == 3
    d.new = {"nested": True}
    assert d.new.nested is True
    with pytest.raises(AttributeError):
        _ = d.missing
    assert d.get("missing") is None


def test_reference_config_schema_loads():
    for kind in ("train", "test"):
        for name in ("synthetic", "mocap-1d-trans", "mocap-desk2",
                     "office-maze"):
            cfg = load_config(os.path.join(CONFIGS_DIR, kind,
                                           f"{name}.yaml"))
            # the keys the runtime consumes (run.py:38-63)
            assert cfg.eval_target in (["event_view"], ["novel_view"])
            assert cfg.model.nerf.arch in ("ngp", "mlp", "tensorf")
            assert set(cfg.loss.weight) >= {
                "log_intensity_grad", "log_intensity_diff",
                "nerf_mlp_weight_decay",
            }
            assert cfg.optimizer.algo == "adam"
            assert cfg.lr_scheduler.algo == "multi_step_lr"
            for comp in ("contrast_threshold", "refractory_period",
                         "nerf"):
                assert isinstance(cfg.model[comp].load_state_dict, bool)
                assert isinstance(cfg.model[comp].freeze, bool)


def test_save_round_trip(tmp_path):
    cfg = load_config(os.path.join(CONFIGS_DIR, "train", "synthetic.yaml"))
    out = tmp_path / "cfg.yaml"
    save_config(cfg, str(out))
    again = load_config(str(out))
    assert again.to_plain() == cfg.to_plain()


def test_matches_reference_values():
    """Spot-check key hyperparameters against the reference's published
    config values (configs/train/synthetic.yaml)."""
    cfg = load_config(os.path.join(CONFIGS_DIR, "train", "synthetic.yaml"))
    assert cfg.data.train_eff_ray_sample_batch_size == 1048576
    assert cfg.data.train_init_eff_batch_size == 1024
    assert cfg.model.min_modeled_intensity == pytest.approx(0.001)
    ngp = cfg.model.nerf.ngp
    assert ngp.pos_encoding.log2_hashmap_size == 19
    assert ngp.pos_encoding.per_level_scale == pytest.approx(
        1.4472692012786865
    )
    assert cfg.optimizer.lr.contrast_threshold == pytest.approx(0.1)
    assert cfg.optimizer.relative_lr.refractory_period == 50
    assert cfg.lr_scheduler.multi_step_lr.milestones == [20, 30, 36]
    assert cfg.trainer.max_epochs == 40
    assert cfg.trainer.limit_train_batches == 1000
