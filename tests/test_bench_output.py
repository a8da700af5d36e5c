"""The bench's driver contract: ONE compact, parseable JSON line LAST.

BENCH_r03/r04 were recorded `parsed: null` because the full per-config
grid was inlined into the single stdout line and overflowed the driver's
bounded tail capture.  bench.emit now writes the full grid to
BENCH_full.json and keeps the stdout line compact; these tests pin that
contract without running the (TPU-hours) bench itself.
"""

import io
import json
import sys

import bench


def _fake_entry(sps, ms, rf):
    return {
        "roofline_floor_ms": round(ms * rf, 1),
        "roofline_fraction": rf,
        "steps_per_sec": round(1000.0 / ms, 3),
        "ms_per_step": ms,
        "rays_per_sec_per_chip": round(sps / 300.0, 1),
        "ray_samples_per_sec_per_chip": sps,
        "marched_samples_per_sec_per_chip": sps * 1.01,
        "events_per_sec": 400.0,
        "batch_size": 4096,
        "mean_samples_per_ray": 300.0,
        "num_chips": 1,
        "loss": 0.9,
    }


def test_emit_compact_line_roundtrips_and_fits(tmp_path, capsys):
    # a grid at the full production size: 4 fresh + 2 steady entries
    grid = {
        "tensorf@2^20": _fake_entry(3201239.3, 327.7, 0.54),
        "tensorf@2^18": _fake_entry(3627530.1, 144.4, 0.381),
        "ngp@2^20": _fake_entry(276838.7, 7575.2, 0.626),
        "ngp@2^18": _fake_entry(313197.3, 1671.7, 0.714),
        "tensorf@2^20:steady": _fake_entry(3110000.0, 640.2, 0.52),
        "ngp@2^20:steady": _fake_entry(276181.0, 7590.0, 0.623),
        "ngp-128@2^20:steady-sparse": _fake_entry(653000.0, 3211.0, 0.57),
    }
    full_path = tmp_path / "BENCH_full.json"
    bench.emit(grid, "TPU v5 lite0", str(full_path))
    out = capsys.readouterr().out
    last = out.strip().splitlines()[-1]

    parsed = json.loads(last)  # must round-trip
    assert parsed["metric"] == "train_ray_samples_per_sec_per_chip"
    assert parsed["value"] == 3201239.3
    assert parsed["vs_baseline"] > 0
    assert set(parsed["extra"]["grid"]) == set(grid)
    # the driver's capture window: stay comfortably inside it
    assert len(last) < 1500, f"compact line is {len(last)} bytes"

    with open(full_path) as f:
        full = json.load(f)
    assert full["grid"] == grid
    assert full["baseline"]["kind"] == "round1_self"


def test_emit_empty_grid_still_prints_parseable_line(tmp_path, capsys):
    bench.emit({}, "cpu", str(tmp_path / "BENCH_full.json"))
    last = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["value"] == 0 and len(last) < 1500
