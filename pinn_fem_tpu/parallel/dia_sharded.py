"""Distributed banded operator: row-block-sharded DIA matvec + PCG.

Multi-chip scaling for meshes too large for one device's HBM (nothing in
the reference needs this — its largest system is 8 DOFs — but a
production framework does; SURVEY §5 specifies the TPU-native equivalent).

Design (the FEM analogue of block-row SpMV distribution):

  * the DOF axis is split into contiguous row blocks, one per device on
    the mesh's "tp" axis; the diagonals (nd, ndof) shard the same way, so
    each device owns the stiffness rows of its block;
  * a banded matvec row block needs u on [r0 - b, r0 + nr + b) — its own
    block plus a HALO of `bandwidth` entries from each neighbor.  The
    halos move over ICI with TWO jax.lax.ppermute shifts (left and right
    neighbor), not an all_gather: per-step traffic is O(bandwidth), not
    O(ndof);
  * CG's scalars (dots, norms) reduce with lax.psum over "tp"; axpys are
    purely local.  One jitted program runs the whole solve; XLA schedules
    the collectives.

Validated on the 8-virtual-device CPU mesh against the single-device
solver (tests/test_dia_sharded.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dia import DiaLayout


def _pad_rows(ndof: int, n_shards: int) -> int:
    per = -(-ndof // n_shards)
    return per * n_shards


def shard_dia(layout: DiaLayout, diags: jnp.ndarray, mesh: Mesh,
              free_mask: jnp.ndarray, rhs: jnp.ndarray):
    """Pad + device_put the operator/vectors row-block-sharded over "tp".

    Returns (diags_s, mask_s, rhs_s, n_pad) with leading axis ndof_pad
    sharded P("tp").  Padded rows are identity (mask 0) so they are inert.
    """
    tp = mesh.shape["tp"]
    ndof = layout.ndof
    n_pad = _pad_rows(ndof, tp)
    d = jnp.zeros((diags.shape[0], n_pad), diags.dtype).at[:, :ndof].set(diags)
    m = jnp.zeros((n_pad,), diags.dtype).at[:ndof].set(free_mask)
    b = jnp.zeros((n_pad,), diags.dtype).at[:ndof].set(rhs)
    row_shard = NamedSharding(mesh, P(None, "tp"))
    vec_shard = NamedSharding(mesh, P("tp"))
    return (jax.device_put(d, row_shard), jax.device_put(m, vec_shard),
            jax.device_put(b, vec_shard), n_pad)


def _local_matvec(offsets: Tuple[int, ...], d_loc: jnp.ndarray,
                  u_halo: jnp.ndarray, halo: int, nr: int) -> jnp.ndarray:
    """Local rows' K@u given u with `halo` ghost entries on each side."""
    acc = jnp.zeros((nr,), u_halo.dtype)
    for k, off in enumerate(offsets):
        acc = acc + d_loc[k] * jax.lax.dynamic_slice(
            u_halo, (halo + off,), (nr,)
        )
    return acc


def _halo_exchange(u_loc: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """[left ghost | u_loc | right ghost] via two ppermute ring shifts."""
    n_dev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right_edge = u_loc[-halo:]   # goes to my RIGHT neighbor's left ghost
    left_edge = u_loc[:halo]     # goes to my LEFT neighbor's right ghost
    from_left = jax.lax.ppermute(
        right_edge, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    # Zero the wrap-around ghosts at the global boundary (the ring wraps;
    # the matrix does not).
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n_dev - 1,
                           jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, u_loc, from_right])


@partial(jax.jit, static_argnames=("offsets", "halo", "mesh", "max_iter_static"))
def _sharded_cg(d_s, m_s, b_s, tol, max_iter, offsets: tuple, halo: int,
                mesh: Mesh, max_iter_static: int):
    del max_iter_static  # shape-only guard for callers; loop bound is traced

    def body_fn(d_loc, m_loc, b_loc, tol, max_iter):
        nr = b_loc.shape[0]

        def a_op(x_loc):
            xm = x_loc * m_loc
            halo_x = _halo_exchange(xm, halo, "tp")
            return (_local_matvec(offsets, d_loc, halo_x, halo, nr) * m_loc
                    + x_loc * (1.0 - m_loc))

        def pdot(a, b):
            return jax.lax.psum(jnp.dot(a, b), "tp")

        k0 = offsets.index(0)
        diag = d_loc[k0] * m_loc + (1.0 - m_loc)
        inv_diag = 1.0 / diag
        b_vec = b_loc * m_loc
        b_norm2 = pdot(b_vec, b_vec)
        b_norm = jnp.sqrt(jnp.maximum(b_norm2, 1e-30))

        r0 = b_vec - a_op(jnp.zeros_like(b_vec))
        z0 = inv_diag * r0
        rz0 = pdot(r0, z0)

        def cond(c):
            it, _, r, _, rz = c
            ok = jnp.logical_and(jnp.isfinite(rz), rz > 0)
            rn = jnp.sqrt(pdot(r, r))
            return jnp.logical_and(jnp.logical_and(it < max_iter, ok),
                                   rn > tol * b_norm)

        def body(c):
            it, x, r, p, rz = c
            ap = a_op(p)
            denom = pdot(p, ap)
            alpha = rz / jnp.where(jnp.abs(denom) > 0, denom, 1e-30)
            x = x + alpha * p
            r = r - alpha * ap
            z = inv_diag * r
            rz_new = pdot(r, z)
            beta = rz_new / jnp.where(rz != 0, rz, 1e-30)
            p = z + beta * p
            return (it + 1, x, r, p, rz_new)

        init = (jnp.zeros((), jnp.int32), jnp.zeros_like(b_vec), r0, z0, rz0)
        it, x, r, _, _ = jax.lax.while_loop(cond, body, init)
        rel = jnp.sqrt(pdot(r, r)) / b_norm
        return x * m_loc, it, rel

    sm = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp"), P(), P()),
        out_specs=(P("tp"), P(), P()),
        check_vma=False,
    )
    return sm(d_s, m_s, b_s, tol, max_iter)


def dia_cg_solve_sharded(
    layout: DiaLayout,
    diags: jnp.ndarray,
    rhs: jnp.ndarray,
    free_mask: jnp.ndarray,
    mesh: Mesh,
    tol: float = 1e-6,
    max_iter: int = 100000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed Jacobi-PCG over the "tp"-sharded banded operator.

    Same contract as ops.dia.dia_cg_solve; requires
    bandwidth <= ndof_pad / n_shards (halo fits the neighbor block).
    """
    tp = mesh.shape["tp"]
    ndof = layout.ndof
    n_pad = _pad_rows(ndof, tp)
    nr = n_pad // tp
    halo = int(layout.bandwidth)
    if halo > nr:
        raise ValueError(
            f"bandwidth {halo} exceeds the {nr}-row shard; use fewer shards"
        )
    d_s, m_s, b_s, _ = shard_dia(layout, diags, mesh, free_mask, rhs)
    dtype = b_s.dtype
    x, it, rel = _sharded_cg(
        d_s, m_s, b_s, jnp.asarray(tol, dtype), jnp.asarray(max_iter, jnp.int32),
        offsets=tuple(int(o) for o in layout.offsets), halo=halo, mesh=mesh,
        max_iter_static=0,
    )
    return x[:ndof], it, rel
