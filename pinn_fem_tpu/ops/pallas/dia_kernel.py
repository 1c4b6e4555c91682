"""Pallas stencil kernel for the banded (DIA) stiffness matvec.

The XLA slicing form of dia_matvec streams the u vector once per diagonal;
this kernel tiles the output into (ROWS, 128) blocks and applies ALL
diagonals against one VMEM-resident u window, reading u once total.

Design notes (hard-won on this backend — see git history):
  * overlapping halo windows come from binding the SAME padded array three
    times with shifted BlockSpec index maps (prev/cur/next blocks) — the
    manual ANY/HBM->VMEM DMA form faults this remote TPU backend;
  * the sub-lane shift uses pltpu.roll + an iota select; concatenating
    lane-slices of sublane-misaligned window slices crashes the remote
    Mosaic compiler (combination of a 3-way row concat with misaligned
    lane concat);
  * row offsets are static Python ints, so every slice is static.

Validated bit-exact against ops.dia.dia_matvec both in interpreter mode
and compiled on TPU v5e (tests/test_pallas_dia.py + the measurements in
benchmarks/scaling.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 64  # output rows (x 128 lanes) per grid step


def _dia_kernel(u_prev, u_cur, u_next, d_ref, o_ref,
                *, offsets: Sequence[int], halo_rows: int):
    win = jnp.concatenate([
        u_prev[ROWS - halo_rows:, :], u_cur[:], u_next[:halo_rows, :]
    ], axis=0)  # (ROWS + 2 * halo_rows, LANE)
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1)

    acc = jnp.zeros((ROWS, LANE), jnp.float32)
    for k, off in enumerate(offsets):  # static unroll; nd is small
        shifted = off + halo_rows * LANE
        q, s = divmod(shifted, LANE)   # static ints
        a = win[q:q + ROWS, :]
        if s == 0:
            w = a
        else:
            b = win[q + 1:q + 1 + ROWS, :]
            ra = pltpu.roll(a, LANE - s, axis=1)
            rb = pltpu.roll(b, LANE - s, axis=1)
            w = jnp.where(col < LANE - s, ra, rb)
        acc = acc + d_ref[k] * w
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n_rows", "halo_rows"))
def _run(u_padded, diags_rows, offsets: tuple, n_rows: int, halo_rows: int):
    nd = len(offsets)
    kernel = functools.partial(_dia_kernel, offsets=offsets,
                               halo_rows=halo_rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
        grid=(n_rows // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # prev block
            pl.BlockSpec((ROWS, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),      # current block
            pl.BlockSpec((ROWS, LANE), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),      # next block
            pl.BlockSpec((nd, ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(u_padded, u_padded, u_padded, diags_rows)


def dia_matvec_pallas(layout, diags: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """K @ u via the Pallas stencil kernel (float32).

    layout: ops.dia.DiaLayout; diags: (nd, ndof); u: (ndof,).
    Requires bandwidth <= ROWS * LANE (halo fits the neighbor block).
    """
    ndof = layout.ndof
    halo_rows = int(np.ceil(layout.bandwidth / LANE))
    if halo_rows > ROWS:
        raise ValueError(
            f"bandwidth {layout.bandwidth} exceeds the kernel halo capacity"
        )
    halo_rows = max(halo_rows, 1)
    n_rows = -(-ndof // LANE)
    n_rows = -(-n_rows // ROWS) * ROWS

    flat = jnp.zeros((n_rows * LANE,), jnp.float32).at[:ndof].set(u)
    # One zero block on each side serves the prev/next index maps.
    u_padded = jnp.concatenate([
        jnp.zeros((ROWS, LANE), jnp.float32),
        flat.reshape(n_rows, LANE),
        jnp.zeros((ROWS, LANE), jnp.float32),
    ])
    diags_rows = jnp.zeros((layout.n_diags, n_rows * LANE), jnp.float32)
    diags_rows = diags_rows.at[:, :ndof].set(diags)
    diags_rows = diags_rows.reshape(layout.n_diags, n_rows, LANE)

    out = _run(u_padded, diags_rows,
               tuple(int(o) for o in layout.offsets), n_rows, halo_rows)
    return out.reshape(-1)[:ndof]
