"""Occupancy grid: EMA updates, binarization, sampling (nerfacc semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_e_nerf_tpu.models import contraction, occupancy

AABB = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def make_spec(res=8, thre=0.01, decay=0.95):
    return occupancy.build_spec(
        {"resolution": res, "occ_thre": thre, "ema_decay": decay,
         "warmup_steps": 4, "n": 2},
        contraction.AABB,
    )


def sphere_density(x, radius=0.5, value=10.0):
    inside = jnp.linalg.norm(x, axis=-1) < radius
    return (inside * value)[:, None]


def test_warmup_update_marks_sphere_occupied():
    spec = make_spec()
    state = occupancy.init_state(spec)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        state = occupancy.update_all_cells(
            state, lambda x: sphere_density(x) * 0.01,
            jax.random.fold_in(key, i), AABB, spec,
        )
    binary = np.asarray(state["binary"]).reshape(spec.resolution)
    # center cells occupied
    assert binary[4, 4, 4] or binary[3, 3, 3]
    # far corners not occupied
    assert not binary[0, 0, 0] and not binary[7, 7, 7]
    frac = binary.mean()
    assert 0.0 < frac < 0.3  # sphere of r=0.5 in box of 2 -> ~6.5% cells


def test_ema_decay_clears_stale_cells():
    spec = make_spec(decay=0.5)
    state = occupancy.init_state(spec)
    key = jax.random.PRNGKey(1)
    state = occupancy.update_all_cells(
        state, lambda x: sphere_density(x) * 0.01, key, AABB, spec
    )
    occupied_before = int(np.asarray(state["binary"]).sum())
    assert occupied_before > 0
    # the scene empties -> repeated updates decay the EMA values toward
    # zero (nerfacc binarizes against min(mean, thre), so *relative*
    # occupancy above the mean persists — only the values decay)
    for i in range(40):
        state = occupancy.update_all_cells(
            state, lambda x: jnp.zeros((x.shape[0], 1)),
            jax.random.fold_in(key, i), AABB, spec,
        )
    assert float(np.asarray(state["occs"]).max()) < 1e-3


def test_binarize_threshold_is_min_of_mean_and_thre():
    # thre caps the threshold: uniform value 0.4 > thre 0.01 -> all cells
    # occupied even though nothing exceeds the mean
    spec = make_spec(thre=0.01)
    state = occupancy.init_state(spec)
    state = occupancy.update_all_cells(
        state, lambda x: jnp.full((x.shape[0], 1), 0.4),
        jax.random.PRNGKey(2), AABB, spec,
    )
    assert int(np.asarray(state["binary"]).sum()) == spec.num_cells
    # and with a large thre the threshold falls back to the mean: a field
    # with two clearly separated levels marks only the high half
    spec2 = make_spec(thre=0.9)
    state2 = occupancy.init_state(spec2)

    def two_level(x):
        return jnp.where(x[:, :1] > 0, 0.8, 0.2)

    state2 = occupancy.update_all_cells(
        state2, two_level, jax.random.PRNGKey(3), AABB, spec2
    )
    frac = np.asarray(state2["binary"]).mean()
    assert 0.4 < frac < 0.6


def test_sampled_update_touches_occupied_cells():
    spec = make_spec()
    state = occupancy.init_state(spec)
    key = jax.random.PRNGKey(3)
    state = occupancy.update_all_cells(
        state, lambda x: sphere_density(x) * 0.01, key, AABB, spec
    )
    occs_before = np.asarray(state["occs"]).copy()
    state2 = occupancy.update_sampled_cells(
        state, lambda x: sphere_density(x) * 0.01,
        jax.random.fold_in(key, 9), AABB, spec,
    )
    # some cells changed, grid shape preserved, still finite
    assert state2["occs"].shape == occs_before.shape
    assert np.isfinite(np.asarray(state2["occs"])).all()


def test_lookup_consistent_with_cell_index():
    spec = make_spec(res=4)
    binary = jnp.zeros((spec.num_cells,), bool).at[0].set(True)
    # contracted position in the first cell (x,y,z all < 0.25)
    c = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]])
    hit = occupancy.lookup(binary, c, spec)
    assert bool(hit[0]) and not bool(hit[1])


def test_cell_coords_roundtrip():
    spec = make_spec(res=4)
    idx = jnp.arange(spec.num_cells, dtype=jnp.int32)
    coords = occupancy._cell_coords(idx, spec)
    back = (
        coords[:, 0] * 16 + coords[:, 1] * 4 + coords[:, 2]
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
