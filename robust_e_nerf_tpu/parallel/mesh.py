"""Device mesh + sharding helpers (data parallelism over ICI).

The reference's DDP/NCCL setup (run.py:81-97) maps to a 1-D
`jax.sharding.Mesh` with the batch dimension sharded across chips and
parameters replicated; XLA's collectives replace NCCL all-reduce
(SURVEY.md section 2.3/5.8).  The training step runs under `shard_map` so
each chip marches/compacts its own fixed-capacity sample buffer and only
scalar loss numerators/denominators cross the interconnect (`psum`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_chips=None):
    devices = jax.devices()
    if num_chips is not None:
        assert num_chips <= len(devices), (
            f"requested {num_chips} chips, only {len(devices)} available"
        )
        devices = devices[:num_chips]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def put_replicated(tree, mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def put_batch(tree, mesh):
    sharding = batch_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def balanced_valid_mask(capacity, batch_size, num_shards):
    """Validity mask spreading `batch_size` real rows evenly over the
    `num_shards` contiguous shards of a `capacity`-row batch, so per-chip
    marching work stays balanced."""
    assert capacity % num_shards == 0
    per_shard_cap = capacity // num_shards
    counts = np.full(num_shards, batch_size // num_shards, dtype=np.int64)
    counts[: batch_size % num_shards] += 1
    local = np.arange(per_shard_cap)
    return (local[None, :] < counts[:, None]).reshape(-1)
