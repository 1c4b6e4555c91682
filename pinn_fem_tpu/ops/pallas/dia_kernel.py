"""Pallas stencil kernel for the banded (DIA) stiffness matvec.

The XLA slicing form of dia_matvec streams the u vector once per diagonal;
this kernel tiles the output into (rows, 128) blocks and applies ALL
diagonals against one VMEM-resident u window.

Performance history (measured at 1M elements / 2M DOFs, 7 diagonals, on
the attached TPU — see benchmarks/scaling.py):
  * round 1: diagonal-major (nd, n_rows, LANE) blocks, rows=64 -> 0.47 ms
    (~190 GB/s).  Ablation showed the cost was NOT the lane rolls (an
    aligned-offsets variant was equally slow) and NOT grid overhead
    (rows=512 gained only ~15%) — it was the diagonal DMA: each grid step
    pulled nd thin slices strided 8 MB apart in HBM.
  * round 2: DIAG-MINOR INTERLEAVED layout (n_rows, nd*LANE) — each grid
    step's diagonal block is ONE contiguous DMA -> 0.073 ms (~1.2 TB/s,
    at the measured streaming roof of this chip; the pure-copy probe gives
    ~1.8 TB/s and a single-diagonal kernel ~1.26 TB/s).  6.4x over the
    round-1 kernel, 5x over XLA slicing.

The interleaved diagonals are produced ONCE per assembly by
pack_dia_interleaved() and reused across every CG matvec (ops/dia.py
packs at the top of dia_cg_solve).

Design notes (hard-won on this backend — see git history):
  * overlapping halo windows come from binding the SAME padded array three
    times with shifted BlockSpec index maps (prev/cur/next blocks) — the
    manual ANY/HBM->VMEM DMA form faults this remote TPU backend;
  * the sub-lane shift uses pltpu.roll + an iota select; concatenating
    lane-slices of sublane-misaligned window slices crashes the remote
    Mosaic compiler;
  * row offsets are static Python ints, so every slice is static.

Validated bit-exact against ops.dia.dia_matvec both in interpreter mode
and compiled on TPU (tests/test_pallas_dia.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 512  # default output rows (x 128 lanes) per grid step


class PackedDia(NamedTuple):
    """Diag-minor interleaved diagonals, ready for the stencil kernel.

    data: (n_rows, nd * LANE) float32 — row-block-major, diagonal-minor, so
        each grid step's diagonal block is one contiguous DMA.
    rows / halo_rows / n_rows: static kernel geometry.
    """

    data: jnp.ndarray
    rows: int
    halo_rows: int
    n_rows: int


def _pick_rows(n_diags: int, rows: int = None) -> int:
    """Output-block rows: big enough to amortize per-grid-step overhead,
    small enough that the interleaved diagonal block plus u/out blocks fit
    comfortably in ~16 MB VMEM with double buffering."""
    if rows is not None:
        return rows
    r = ROWS
    while r > 64 and (n_diags + 4) * 2 * r * LANE * 4 > 8 * 2**20:
        r //= 2
    return r


def pack_dia_interleaved(layout, diags: jnp.ndarray, rows: int = None
                         ) -> PackedDia:
    """(nd, ndof) diagonal storage -> kernel-ready interleaved layout.

    One 2x-traffic transpose per assembly, amortized over every matvec of
    the CG loop (the diagonal-major layout cost ~6x per matvec in strided
    DMA stalls)."""
    nd = layout.n_diags
    ndof = layout.ndof
    rows = _pick_rows(nd, rows)
    halo_rows = max(int(np.ceil(layout.bandwidth / LANE)), 1)
    if halo_rows > rows:
        raise ValueError(
            f"bandwidth {layout.bandwidth} exceeds the kernel halo capacity"
        )
    n_rows = -(-ndof // LANE)
    n_rows = -(-n_rows // rows) * rows
    d = jnp.zeros((nd, n_rows * LANE), jnp.float32).at[:, :ndof].set(diags)
    d = d.reshape(nd, n_rows, LANE).transpose(1, 0, 2).reshape(n_rows, nd * LANE)
    return PackedDia(data=d, rows=rows, halo_rows=halo_rows, n_rows=n_rows)


def _dia_kernel(u_prev, u_cur, u_next, d_ref, o_ref,
                *, offsets: Sequence[int], halo_rows: int, rows: int):
    win = jnp.concatenate([
        u_prev[rows - halo_rows:, :], u_cur[:], u_next[:halo_rows, :]
    ], axis=0)  # (rows + 2 * halo_rows, LANE)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    acc = jnp.zeros((rows, LANE), jnp.float32)
    for k, off in enumerate(offsets):  # static unroll; nd is small
        shifted = off + halo_rows * LANE
        q, s = divmod(shifted, LANE)   # static ints
        a = win[q:q + rows, :]
        if s == 0:
            w = a
        else:
            b = win[q + 1:q + 1 + rows, :]
            ra = pltpu.roll(a, LANE - s, axis=1)
            rb = pltpu.roll(b, LANE - s, axis=1)
            w = jnp.where(col < LANE - s, ra, rb)
        acc = acc + d_ref[:, k * LANE:(k + 1) * LANE] * w
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_rows", "halo_rows", "rows")
)
def _run(u_padded, d_interleaved, offsets: tuple, n_rows: int,
         halo_rows: int, rows: int):
    nd = len(offsets)
    kernel = functools.partial(_dia_kernel, offsets=offsets,
                               halo_rows=halo_rows, rows=rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
        grid=(n_rows // rows,),
        in_specs=[
            pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # prev block
            pl.BlockSpec((rows, LANE), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),      # current block
            pl.BlockSpec((rows, LANE), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),      # next block
            pl.BlockSpec((rows, nd * LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # contiguous diags
        ],
        out_specs=pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(u_padded, u_padded, u_padded, d_interleaved)


def dia_matvec_packed(layout, packed: PackedDia, u: jnp.ndarray
                      ) -> jnp.ndarray:
    """K @ u from pre-packed diagonals — the hot CG path (float32)."""
    ndof = layout.ndof
    rows, halo_rows, n_rows = packed.rows, packed.halo_rows, packed.n_rows
    flat = jnp.zeros((n_rows * LANE,), jnp.float32).at[:ndof].set(u)
    # One zero block on each side serves the prev/next index maps.
    u_padded = jnp.concatenate([
        jnp.zeros((rows, LANE), jnp.float32),
        flat.reshape(n_rows, LANE),
        jnp.zeros((rows, LANE), jnp.float32),
    ])
    out = _run(u_padded, packed.data,
               tuple(int(o) for o in layout.offsets), n_rows, halo_rows,
               rows)
    return out.reshape(-1)[:ndof]


def dia_matvec_pallas(layout, diags: jnp.ndarray, u: jnp.ndarray,
                      rows: int = None) -> jnp.ndarray:
    """K @ u via the Pallas stencil kernel from (nd, ndof) diagonals.

    Packs on every call — convenient for one-off products; inside an
    iterative solver, pack_dia_interleaved() once and use
    dia_matvec_packed() instead.
    """
    packed = pack_dia_interleaved(layout, diags, rows=rows)
    return dia_matvec_packed(layout, packed, u)
