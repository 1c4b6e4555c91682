"""Pallas stencil kernel for the banded (DIA) stiffness matvec.

The XLA slicing form of dia_matvec streams the u vector once per diagonal
(nd reads of u + nd reads of the diagonals).  This kernel tiles the output
into (ROWS, 128) blocks, DMAs each block's u-window WITH HALO into VMEM
once, and applies all diagonals against that resident window:

    traffic:  u read once + diags once + out once
    vs XLA:   u read nd times + diags once + out once

Offsets decompose as off = q * 128 + s; the shifted window is two lane
slices of consecutive row-blocks concatenated on the lane axis (classic
TPU stencil pattern).

STATUS: EXPERIMENTAL — bit-exact against ops.dia.dia_matvec in interpreter
mode (tests/test_pallas_dia.py), but the compiled kernel faulted the TPU
worker on first execution through the remote attachment (suspects: the
manual ANY->VMEM halo DMA, or the misaligned lane-slice concatenation).
Not wired into any production path; the XLA slicing form in ops/dia.py
(already ~100x over the gather operator) remains the default.  Root-cause
with pl.debug_print / interpret-vs-device bisection before enabling.
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


def _dia_kernel(u_hbm, diags_ref, out_ref, u_scratch, sem,
                *, offsets: Sequence[int], halo_rows: int):
    i = pl.program_id(0)
    # DMA this block's u window (with halo) from ANY/HBM into VMEM.
    copy = pltpu.make_async_copy(
        u_hbm.at[pl.ds(i * ROWS, ROWS + 2 * halo_rows), :],
        u_scratch,
        sem,
    )
    copy.start()
    copy.wait()

    acc = jnp.zeros((ROWS, LANE), jnp.float32)
    for k, off in enumerate(offsets):  # static unroll, nd is small
        shifted = off + halo_rows * LANE
        q, s = divmod(shifted, LANE)
        a = u_scratch[pl.ds(q, ROWS), :]
        if s == 0:
            w = a
        else:
            b = u_scratch[pl.ds(q + 1, ROWS), :]
            w = jnp.concatenate([a[:, s:], b[:, :s]], axis=1)
        acc = acc + diags_ref[k] * w
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n_rows", "halo_rows"))
def _run(u_padded, diags_rows, offsets: tuple, n_rows: int, halo_rows: int):
    grid = (n_rows // ROWS,)
    kernel = functools.partial(
        _dia_kernel, offsets=offsets, halo_rows=halo_rows
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # u window DMA'd manually
            pl.BlockSpec((len(offsets), ROWS, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 2 * halo_rows, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(u_padded, diags_rows)


def dia_matvec_pallas(layout, diags: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """K @ u via the Pallas stencil kernel (float32, TPU).

    layout: ops.dia.DiaLayout; diags: (nd, ndof); u: (ndof,).
    """
    ndof = layout.ndof
    halo_rows = int(np.ceil(layout.bandwidth / LANE)) + 1
    n_rows = -(-ndof // LANE)
    n_rows = -(-n_rows // ROWS) * ROWS  # multiple of ROWS

    flat = jnp.zeros(((n_rows + 2 * halo_rows) * LANE,), jnp.float32)
    flat = flat.at[halo_rows * LANE: halo_rows * LANE + ndof].set(u)
    u_padded = flat.reshape(n_rows + 2 * halo_rows, LANE)

    diags_rows = jnp.zeros((layout.n_diags, n_rows * LANE), jnp.float32)
    diags_rows = diags_rows.at[:, :ndof].set(diags)
    diags_rows = diags_rows.reshape(layout.n_diags, n_rows, LANE)

    out = _run(u_padded, diags_rows,
               tuple(int(o) for o in layout.offsets), n_rows, halo_rows)
    return out.reshape(-1)[:ndof]
