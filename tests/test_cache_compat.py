"""On-disk interchange with the reference: torch events.pt cache reading,
npz cache round trip."""

import numpy as np
import torch

from robust_e_nerf_tpu.data import events as ev


def fake_events(n=100, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "position": rng.integers(0, 32, (n, 2)).astype(np.float32),
        "start_ts": np.sort(rng.integers(0, 10**9, n)).astype(np.int64),
        "end_ts": np.sort(rng.integers(10**9, 2 * 10**9, n)).astype(
            np.int64
        ),
        "num_pos": rng.integers(0, 2, n).astype(np.int64),
        "num_neg": rng.integers(0, 2, n).astype(np.int64),
    }


def test_reads_reference_torch_cache(tmp_path):
    """The reference caches transformed events as a torch-saved dict of
    tensors (datasets.py:84-95); we must load it transparently."""
    data = fake_events()
    torch_dict = {k: torch.from_numpy(v.copy()) for k, v in data.items()}
    torch.save(torch_dict, tmp_path / ev.TORCH_TF_EVENTS_FILENAME)
    loaded = ev.load_transformed_events(str(tmp_path))
    assert loaded is not None
    for k in data:
        np.testing.assert_array_equal(np.asarray(loaded[k]), data[k])


def test_npz_cache_round_trip(tmp_path):
    data = fake_events()
    ev.save_transformed_events(data, str(tmp_path))
    loaded = ev.load_transformed_events(str(tmp_path))
    for k in data:
        np.testing.assert_array_equal(loaded[k], data[k])
    assert loaded["start_ts"].dtype == np.int64


def test_npz_cache_preferred_over_torch(tmp_path):
    """When both caches exist, ours wins (it is the newer artifact)."""
    data = fake_events()
    ev.save_transformed_events(data, str(tmp_path))
    other = fake_events(rng=np.random.default_rng(7))
    torch.save({k: torch.from_numpy(v.copy()) for k, v in other.items()},
               tmp_path / ev.TORCH_TF_EVENTS_FILENAME)
    loaded = ev.load_transformed_events(str(tmp_path))
    np.testing.assert_array_equal(loaded["start_ts"], data["start_ts"])
