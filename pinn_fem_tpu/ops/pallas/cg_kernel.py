"""Fused PCG iteration for the banded (DIA) operator: two Pallas kernels.

Why: at moderate DOF counts the banded Jacobi-PCG is OP-OVERHEAD-bound on
TPU, not bandwidth-bound — one iteration of the XLA form is ~14 separate
ops (matvec + repacking + masking + 2 dots + 3 axpys + preconditioner),
each with fixed launch cost, and the hot matvec repacks `u` into the
kernel layout on every call.  At large DOF counts the same ops cost ~30
full HBM passes.  This module fuses one whole PCG iteration into exactly
TWO kernels over vectors that LIVE in the kernel's (n_rows, 128) layout
across the entire solve (packed once per solve, unpacked once at the end):

  kernel A (direction + matvec + reduction):
      p_new = z + beta * p                    (pointwise, incl. halo rows)
      ap    = mask * (K @ p_new)              (DIA stencil, VMEM-resident)
      partial[pap] = sum(p_new * ap)          (per-block partial)

  kernel B (update + preconditioner + reductions):
      x += alpha * p ;  r -= alpha * ap ;  z = inv_diag * r
      partial[rz] = sum(r * z) ;  partial[r2] = sum(r * r)

The search-direction update rides inside the matvec kernel: p_new is a
POINTWISE function of (z, p) — scalar beta — so the matvec's halo windows
of p_new are reconstructed from halo windows of z and p, eliminating the
separate direction-update pass entirely.  Scalar recurrences
(alpha = rz / pAp, beta = rz' / rz) stay in XLA between the two kernels;
block partials are summed by one tiny XLA reduce each (n_blocks is tens).

Halo handling differs from dia_kernel.py: instead of guard blocks
materialized by a host-side concatenate (an extra full pass over u per
matvec), the prev/next blocks use CLAMPED index maps and the out-of-range
halo rows are zeroed in-kernel from program_id — no repacking, vectors
stay put.

Mathematically this is plain PCG (same recurrence as ops/dia.dia_cg_solve)
— reduction order differs, so agreement with the XLA path is to float32
rounding, not bit-exact (tests/test_pallas_cg.py).

No counterpart exists in the reference (its largest system is 8x8 dense);
this is the production large-mesh path (SURVEY §7 north star).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dia_kernel import LANE, PackedDia, pack_dia_interleaved


def pack_vec(v: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """(ndof,) -> (n_rows, LANE) zero-padded kernel layout."""
    flat = jnp.zeros((n_rows * LANE,), jnp.float32).at[: v.shape[0]].set(v)
    return flat.reshape(n_rows, LANE)


def unpack_vec(v2: jnp.ndarray, ndof: int) -> jnp.ndarray:
    return v2.reshape(-1)[:ndof]


def _window(prev, cur, nxt, rows: int, halo: int, i, nb):
    """(rows + 2*halo, LANE) window with out-of-range halos zeroed.

    prev/next come from CLAMPED index maps, so at the boundary blocks they
    alias the current block; the first/last grid steps zero those rows.
    """
    top = prev[rows - halo :, :]
    bot = nxt[:halo, :]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == nb - 1, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, cur[:], bot], axis=0)


def _stencil(win, d_ref, offsets, halo_rows: int, rows: int):
    """sum_k d_k * shift(win, offset_k) — identical math to dia_kernel."""
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    acc = jnp.zeros((rows, LANE), jnp.float32)
    for k, off in enumerate(offsets):  # static unroll; nd is small
        shifted = off + halo_rows * LANE
        q, s = divmod(shifted, LANE)  # static ints
        a = win[q : q + rows, :]
        if s == 0:
            w = a
        else:
            b = win[q + 1 : q + 1 + rows, :]
            ra = pltpu.roll(a, LANE - s, axis=1)
            rb = pltpu.roll(b, LANE - s, axis=1)
            w = jnp.where(col < LANE - s, ra, rb)
        acc = acc + d_ref[:, k * LANE : (k + 1) * LANE] * w
    return acc


def _dir_matvec_kernel(beta_ref, z_prev, z_cur, z_next, p_prev, p_cur,
                       p_next, d_ref, mask_ref, p_out, ap_out, pap_out,
                       *, offsets, halo_rows: int, rows: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    beta = beta_ref[0, 0]
    z_win = _window(z_prev, z_cur, z_next, rows, halo_rows, i, nb)
    p_win = _window(p_prev, p_cur, p_next, rows, halo_rows, i, nb)
    pn_win = z_win + beta * p_win
    ap = _stencil(pn_win, d_ref, offsets, halo_rows, rows) * mask_ref[:]
    pn = pn_win[halo_rows : halo_rows + rows, :]
    p_out[:] = pn
    ap_out[:] = ap
    # Partials array is bound whole (SMEM blocks must match the array
    # shape); each sequential grid step stores its own slot.
    pap_out[i, 0] = jnp.sum(pn * ap)


def _update_kernel(alpha_ref, x_ref, r_ref, p_ref, ap_ref, invd_ref,
                   x_out, r_out, z_out, red_out):
    i = pl.program_id(0)
    alpha = alpha_ref[0, 0]
    x = x_ref[:] + alpha * p_ref[:]
    r = r_ref[:] - alpha * ap_ref[:]
    z = invd_ref[:] * r
    x_out[:] = x
    r_out[:] = r
    z_out[:] = z
    red_out[i, 0] = jnp.sum(r * z)
    red_out[i, 1] = jnp.sum(r * r)


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_rows", "halo_rows", "rows")
)
def _dir_matvec(beta, z2, p2, d_interleaved, mask2, offsets: tuple,
                n_rows: int, halo_rows: int, rows: int):
    nd = len(offsets)
    nb = n_rows // rows
    kernel = functools.partial(_dir_matvec_kernel, offsets=offsets,
                               halo_rows=halo_rows, rows=rows)
    blk = lambda i: (i, 0)
    prev = lambda i: (jnp.maximum(i - 1, 0), 0)
    nxt = lambda i: (jnp.minimum(i + 1, nb - 1), 0)
    vspec = lambda im: pl.BlockSpec((rows, LANE), im, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),   # p_new
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),   # ap
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),          # pap parts
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vspec(prev), vspec(blk), vspec(nxt),                 # z windows
            vspec(prev), vspec(blk), vspec(nxt),                 # p windows
            pl.BlockSpec((rows, nd * LANE), blk, memory_space=pltpu.VMEM),
            vspec(blk),                                          # mask
        ],
        out_specs=(
            vspec(blk),
            vspec(blk),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
    )(jnp.asarray(beta, jnp.float32).reshape(1, 1),
      z2, z2, z2, p2, p2, p2, d_interleaved, mask2)


@functools.partial(jax.jit, static_argnames=("n_rows", "rows"))
def _update(alpha, x2, r2, p2, ap2, invd2, n_rows: int, rows: int):
    nb = n_rows // rows
    blk = lambda i: (i, 0)
    vspec = pl.BlockSpec((rows, LANE), blk, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _update_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),   # x
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),   # r
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),   # z
            jax.ShapeDtypeStruct((nb, 2), jnp.float32),          # rz, r.r
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vspec, vspec, vspec, vspec, vspec,
        ],
        out_specs=(
            vspec, vspec, vspec,
            pl.BlockSpec((nb, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
    )(jnp.asarray(alpha, jnp.float32).reshape(1, 1), x2, r2, p2, ap2, invd2)


def fused_cg_solve(
    layout,
    diags: jnp.ndarray,
    rhs: jnp.ndarray,
    free_mask: jnp.ndarray,
    tol=1e-6,
    max_iter=100000,
    x0=None,
    packed: PackedDia = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jacobi-PCG with the fused two-kernel iteration.

    Same contract as ops.dia.dia_cg_solve (precond="jacobi"): returns
    (x * mask, iterations, relative recurrence-residual norm), same
    convergence / float32-breakdown gates.  `packed` lets callers reuse an
    already-interleaved operator.
    """
    from ..dia import dia_diagonal, dia_matvec

    if packed is None:
        packed = pack_dia_interleaved(layout, diags)
    rows, halo_rows, n_rows = packed.rows, packed.halo_rows, packed.n_rows
    offsets = tuple(int(o) for o in layout.offsets)

    mask = free_mask
    b_vec = rhs * mask
    diag = dia_diagonal(layout, diags) * mask + (1.0 - mask)
    inv_diag = (1.0 / diag) * mask  # fixed rows: r == 0 anyway; padding: 0
    b_norm = jnp.maximum(jnp.linalg.norm(b_vec), 1e-30)

    # Setup (once): r0 = b - A x0 via the XLA matvec, then pack everything
    # into the persistent kernel layout.
    if x0 is None:
        x0 = jnp.zeros_like(b_vec)
        r0 = b_vec
    else:
        x0 = x0 * mask
        r0 = b_vec - (dia_matvec(layout, diags, x0) * mask)
    z0 = inv_diag * r0
    rz0 = jnp.dot(r0, z0)

    x2 = pack_vec(x0, n_rows)
    r2 = pack_vec(r0, n_rows)
    z2 = pack_vec(z0, n_rows)
    p2 = jnp.zeros_like(z2)  # beta=0 on the first step -> p_new = z0
    mask2 = pack_vec(mask, n_rows)
    invd2 = pack_vec(inv_diag, n_rows)

    f32 = jnp.float32

    def cond(c):
        it, _, _, _, _, rz, _, rn2 = c
        ok = jnp.logical_and(jnp.isfinite(rz), rz > 0)
        return jnp.logical_and(
            jnp.logical_and(it < max_iter, ok),
            jnp.sqrt(rn2) > tol * b_norm,
        )

    def body(c):
        it, x2, r2, z2, p2, rz, beta, _ = c
        p_new, ap, pap_parts = _dir_matvec(
            beta, z2, p2, packed.data, mask2, offsets, n_rows, halo_rows,
            rows)
        pap = jnp.sum(pap_parts)
        alpha = rz / jnp.where(jnp.abs(pap) > 0, pap, 1e-30)
        x2, r2, z2, red = _update(alpha, x2, r2, p_new, ap, invd2, n_rows,
                                  rows)
        rz_new = jnp.sum(red[:, 0])
        rn2 = jnp.sum(red[:, 1])
        beta = rz_new / jnp.where(rz != 0, rz, 1e-30)
        return (it + 1, x2, r2, z2, p_new, rz_new, beta, rn2)

    init = (jnp.zeros((), jnp.int32), x2, r2, z2, p2, rz0,
            jnp.zeros((), f32), jnp.dot(r0, r0))
    it, x2, _, _, _, _, _, rn2 = jax.lax.while_loop(cond, body, init)
    x = unpack_vec(x2, layout.ndof)
    return x * mask, it, jnp.sqrt(rn2) / b_norm
