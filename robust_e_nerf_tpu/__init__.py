"""Robust e-NeRF, TPU-native.

A from-scratch JAX / XLA implementation of the capabilities of the
reference CUDA/PyTorch implementation of "Robust e-NeRF: NeRF from Sparse &
Noisy Events under Non-Uniform Motion" (ICCV 2023).

Design stance (TPU-first, not a port):
  * Everything device-side is fixed-shape and jit-compiled.  The reference's
    ragged ray samples become a masked sample lattice compacted into a
    fixed-capacity sample buffer, so the hot field evaluation is always a
    dense matmul on the MXU.
  * The reference's CUDA dependencies (nerfacc occupancy grid / ray marching /
    compositing, tiny-cuda-nn hash grid) are re-designed as pure XLA programs
    with custom gradient transposes tuned to the TPU memory system; there
    is no translation of CUDA kernels (a Pallas marcher prototype was
    evaluated and priced out, docs/PERFORMANCE.md).
  * Data parallelism is expressed with `jax.sharding` over a device mesh
    (collectives inserted by XLA), not NCCL.
  * Absolute times live on the host as int64 nanoseconds and reach the device
    as re-based float32 seconds; interval quantities are computed exactly on
    the host and shipped separately so no precision is lost to f32 rounding.
"""

from . import utils, data, models, ops, loss_metric, engine, parallel  # noqa: F401

__version__ = "0.1.0"
