"""Pallas TPU kernel: fused ray-march mask + per-ray cumulative counts.

Replaces the XLA candidate-mask pipeline of `ops/ray_march.py` (lattice ->
contraction -> occupancy probe -> in-range mask -> per-row cumsum) with one
kernel that never touches HBM for intermediates.

The occupancy grid is bitpacked into 32-bit words held in VMEM as four
byte planes (values <= 255 are exact in bf16).  TPU vector units cannot
randomly index the sublane axis, so the word fetch is done the MXU way: a
one-hot row-selection matmul over the word-plane rows followed by a
supported lane-axis `take_along_axis` and integer bit extraction.

Scope (v1): cone_angle == 0 (uniform lattice; the TUM-VIE cone path keeps
the XLA marcher), any contraction, word-plane rows <= 1024 (occupancy
resolutions up to 128^3; 256^3 falls back to XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import contraction as contraction_mod

LANES = 128
RAY_BLOCK = 64
SAMPLE_CHUNK = 128


def pack_occupancy(binary, resolution):
    """(num_cells,) bool -> four (rows, 128) f32 byte planes.

    Word w holds cells [32w, 32w+32) and lives at plane[w // 128, w % 128];
    plane j carries bits [8j, 8j+8).  Byte-sized values (<= 255) are exact
    in bf16, which the in-kernel one-hot row-selection matmul requires.
    """
    num_cells = int(np.prod(resolution))
    num_words = -(-num_cells // 32)
    rows = -(-num_words // LANES)
    pad_cells = rows * LANES * 32 - num_cells
    bits = jnp.concatenate(
        [binary.astype(jnp.uint32),
         jnp.zeros((pad_cells,), jnp.uint32)]
    ).reshape(-1, 32)
    words = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                    axis=1, dtype=jnp.uint32)
    planes = []
    for j in range(4):
        byte = (words >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
        planes.append(byte.astype(jnp.float32).reshape(rows, LANES))
    return tuple(planes)


def _march_kernel(scalars_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                  dz_ref, tmin_ref, tmax_ref, step0_ref, b0_ref, b1_ref,
                  b2_ref, b3_ref, within_ref, *, num_samples, res,
                  contraction_type, render_step_size):
    """One ray block: compute within-row cumulative mask counts.

    scalars: (1, 8) SMEM = aabb (6) + padding.
    o*/d*/tmin/tmax/step0: (RAY_BLOCK, 1) VMEM.
    b0..b3: (rows, 128) VMEM byte planes of the packed occupancy words.
    within: (RAY_BLOCK, num_samples) int32 output.
    """
    rows = b0_ref.shape[0]
    aabb = [scalars_ref[0, i] for i in range(6)]
    carry = jnp.zeros((RAY_BLOCK, 1), jnp.int32)

    num_chunks = num_samples // SAMPLE_CHUNK

    def chunk_body(chunk, carry):
        base = chunk * SAMPLE_CHUNK
        i = jax.lax.broadcasted_iota(
            jnp.int32, (RAY_BLOCK, SAMPLE_CHUNK), 1
        ).astype(jnp.float32) + base.astype(jnp.float32)
        t_start = tmin_ref[:] + (i + step0_ref[:]) * render_step_size
        t_mid = t_start + 0.5 * render_step_size

        px = ox_ref[:] + dx_ref[:] * t_mid
        py = oy_ref[:] + dy_ref[:] * t_mid
        pz = oz_ref[:] + dz_ref[:] * t_mid

        # contraction (per-coordinate; mirrors contract_coords)
        nx = (px - aabb[0]) / (aabb[3] - aabb[0])
        ny = (py - aabb[1]) / (aabb[4] - aabb[1])
        nz = (pz - aabb[2]) / (aabb[5] - aabb[2])
        if contraction_type == contraction_mod.SPHERE:
            x = nx * 2.0 - 1.0
            y = ny * 2.0 - 1.0
            z = nz * 2.0 - 1.0
            mag = jnp.sqrt(x * x + y * y + z * z)
            safe = jnp.maximum(mag, 1e-12)
            scale = jnp.where(mag > 1.0, (2.0 - 1.0 / safe) / safe, 1.0)
            nx = x * scale / 4.0 + 0.5
            ny = y * scale / 4.0 + 0.5
            nz = z * scale / 4.0 + 0.5
        elif contraction_type == contraction_mod.TANH:
            nx = (jnp.tanh(nx - 0.5) + 1.0) / 2.0
            ny = (jnp.tanh(ny - 0.5) + 1.0) / 2.0
            nz = (jnp.tanh(nz - 0.5) + 1.0) / 2.0

        ix = jnp.clip((nx * res[0]).astype(jnp.int32), 0, res[0] - 1)
        iy = jnp.clip((ny * res[1]).astype(jnp.int32), 0, res[1] - 1)
        iz = jnp.clip((nz * res[2]).astype(jnp.int32), 0, res[2] - 1)
        cell = ix * (res[1] * res[2]) + iy * res[2] + iz

        word = cell >> 5                 # cell // 32
        bit = cell & 31
        row = (word >> 7).reshape(-1)    # word // 128, (RB*SC,)
        lane = word & 127                # (RB, SC)

        # one-hot row selection on the MXU: (RB*SC, rows) @ (rows, 128);
        # byte planes keep every value bf16-exact
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (RAY_BLOCK * SAMPLE_CHUNK, rows), 1
        )
        onehot = (row_iota == row[:, None]).astype(jnp.bfloat16)
        # Mosaic's lane gather wants indices shaped like the data: gather
        # the same lane into every output lane, keep column 0
        lane_bcast = jnp.broadcast_to(
            lane.reshape(-1, 1), (RAY_BLOCK * SAMPLE_CHUNK, LANES)
        )
        word_val = jnp.zeros((RAY_BLOCK * SAMPLE_CHUNK, 1), jnp.int32)
        for j, plane_ref in enumerate((b0_ref, b1_ref, b2_ref, b3_ref)):
            sel = jnp.dot(onehot, plane_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            byte = jnp.take_along_axis(sel, lane_bcast, axis=1)[:, :1]
            word_val = word_val | (byte.astype(jnp.int32) << (8 * j))
        word_val = word_val.reshape(RAY_BLOCK, SAMPLE_CHUNK)
        occupied = ((word_val >> bit) & 1) > 0

        in_range = (t_mid < tmax_ref[:]) & (tmax_ref[:] > tmin_ref[:])
        mask = (occupied & in_range).astype(jnp.int32)

        # Hillis-Steele inclusive scan along lanes (Mosaic has no cumsum)
        col = jax.lax.broadcasted_iota(
            jnp.int32, (RAY_BLOCK, SAMPLE_CHUNK), 1
        )
        within_chunk = mask
        shift = 1
        while shift < SAMPLE_CHUNK:
            rolled = pltpu.roll(within_chunk, shift, axis=1)
            within_chunk = within_chunk + jnp.where(
                col >= shift, rolled, 0
            )
            shift *= 2
        within_chunk = within_chunk + carry
        within_ref[:, pl.ds(base, SAMPLE_CHUNK)] = within_chunk
        return within_chunk[:, -1:]

    jax.lax.fori_loop(0, num_chunks, chunk_body, carry)


@functools.partial(
    jax.custom_jvp,
    nondiff_argnums=(7, 8, 9, 10, 11),
)
def march_mask_cumsum(
    aabb, origins, directions, t_min, t_max, step0, packed_planes,
    num_samples, resolution, contraction_type, render_step_size,
    interpret=False,
):
    """Within-row cumulative mask counts (B, S) for the uniform lattice.

    Equivalent to the XLA pipeline in ray_march.march_and_compact for
    cone_angle == 0; the per-slot binary search downstream consumes the
    result unchanged.  Integer-valued and non-differentiable (like
    nerfacc's marching); the custom JVP emits symbolic-zero tangents so the
    kernel sits inside differentiated training code without a Pallas AD
    rule.
    """
    num_rays = origins.shape[0]
    assert num_rays % RAY_BLOCK == 0, num_rays
    assert num_samples % SAMPLE_CHUNK == 0, num_samples
    rows = packed_planes[0].shape[0]

    scalars = jnp.concatenate(
        [aabb.astype(jnp.float32), jnp.zeros((2,), jnp.float32)]
    ).reshape(1, 8)

    def col(x):
        return x.reshape(num_rays, 1)

    kernel = functools.partial(
        _march_kernel,
        num_samples=num_samples,
        res=resolution,
        contraction_type=contraction_type,
        render_step_size=render_step_size,
    )
    grid = (num_rays // RAY_BLOCK,)

    def ray_spec():
        return pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            ray_spec(), ray_spec(), ray_spec(),
            ray_spec(), ray_spec(), ray_spec(),
            ray_spec(), ray_spec(), ray_spec(),
        ] + [
            pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, num_samples),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_rays, num_samples), jnp.int32),
        interpret=interpret,
    )(
        scalars,
        col(origins[:, 0]), col(origins[:, 1]), col(origins[:, 2]),
        col(directions[:, 0]), col(directions[:, 1]),
        col(directions[:, 2]),
        col(t_min), col(t_max), col(step0),
        *packed_planes,
    )


@march_mask_cumsum.defjvp
def _march_mask_cumsum_jvp(num_samples, resolution, contraction_type,
                           render_step_size, interpret, primals, tangents):
    out = march_mask_cumsum(
        *primals, num_samples, resolution, contraction_type,
        render_step_size, interpret,
    )
    return out, np.zeros(out.shape, dtype=jax.dtypes.float0)
