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


@partial(jax.jit, static_argnames=("offsets", "halo", "mesh"))
def _sharded_cg_block(d_s, m_s, b_s, tol, max_iter, offsets: tuple,
                      halo: int, mesh: Mesh):
    """Block Jacobi-PCG: k right-hand sides in ONE sharded program.

    The eigensolvers' subspace iteration needs k = O(n_modes) solves per
    sweep; running them as k separate `_sharded_cg` programs costs k
    dispatches and k× the collective count.  Here the (nr, k) local
    block shares every halo exchange (ONE pair of ppermutes moves all k
    columns' ghosts) and the per-column CG scalars batch into (k,)
    psums.  Columns converge independently: a finished column freezes
    (alpha = 0, direction held) while the rest iterate — the standard
    masked block iteration."""

    def body_fn(d_loc, m_loc, b_loc, tol, max_iter):
        nr, kcols = b_loc.shape
        mcol = m_loc[:, None]

        def a_op(x_loc):
            xm = x_loc * mcol
            halo_x = _halo_exchange(xm, halo, "tp")
            acc = jnp.zeros_like(x_loc)
            for j, off in enumerate(offsets):
                acc = acc + d_loc[j][:, None] * jax.lax.dynamic_slice(
                    halo_x, (halo + off, 0), (nr, kcols))
            return acc * mcol + x_loc * (1.0 - mcol)

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b, axis=0), "tp")

        k0 = offsets.index(0)
        diag = d_loc[k0] * m_loc + (1.0 - m_loc)
        inv_diag = (1.0 / diag)[:, None]
        b_vec = b_loc * mcol
        b_norm = jnp.sqrt(jnp.maximum(pdot(b_vec, b_vec), 1e-30))

        r0 = b_vec - a_op(jnp.zeros_like(b_vec))
        z0 = inv_diag * r0
        rz0 = pdot(r0, z0)
        active0 = jnp.sqrt(pdot(r0, r0)) > tol * b_norm

        def cond(c):
            it, _, _, _, _, active = c
            return jnp.logical_and(it < max_iter, jnp.any(active))

        def body(c):
            it, x, r, p, rz, active = c
            ap = a_op(p)
            denom = pdot(p, ap)
            alpha = jnp.where(
                active,
                rz / jnp.where(jnp.abs(denom) > 0, denom, 1e-30), 0.0)
            x = x + alpha[None, :] * p
            r = r - alpha[None, :] * ap
            z = inv_diag * r
            rz_new = pdot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            p = jnp.where(active[None, :], z + beta[None, :] * p, p)
            rn = jnp.sqrt(pdot(r, r))
            ok = jnp.logical_and(jnp.isfinite(rz_new), rz_new > 0)
            active = jnp.logical_and(
                active, jnp.logical_and(ok, rn > tol * b_norm))
            return (it + 1, x, r, p, rz_new, active)

        init = (jnp.zeros((), jnp.int32), jnp.zeros_like(b_vec), r0, z0,
                rz0, active0)
        it, x, r, _, _, _ = jax.lax.while_loop(cond, body, init)
        rel = jnp.sqrt(pdot(r, r)) / b_norm
        return x * mcol, it, rel

    sm = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp", None), P(), P()),
        out_specs=(P("tp", None), P(), P()),
        check_vma=False,
    )
    return sm(d_s, m_s, b_s, tol, max_iter)


def dia_cg_solve_sharded_block(
    layout: DiaLayout,
    diags: jnp.ndarray,
    rhs_cols: jnp.ndarray,
    free_mask: jnp.ndarray,
    mesh: Mesh,
    tol: float = 1e-6,
    max_iter: int = 100000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-column variant of dia_cg_solve_sharded: rhs_cols is (ndof, k),
    returns (x (ndof, k), iterations, per-column relative residuals).
    One program, one halo-exchange pair per A-application for ALL
    columns — the multi-chip eigensolvers' block-solve engine."""
    tp = mesh.shape["tp"]
    ndof = layout.ndof
    n_pad = _pad_rows(ndof, tp)
    nr = n_pad // tp
    halo = int(layout.bandwidth)
    if halo > nr:
        raise ValueError(
            f"bandwidth {halo} exceeds the {nr}-row shard; use fewer shards"
        )
    kcols = rhs_cols.shape[1]
    dtype = rhs_cols.dtype
    d = jnp.zeros((diags.shape[0], n_pad), diags.dtype
                  ).at[:, :ndof].set(diags)
    m = jnp.zeros((n_pad,), dtype).at[:ndof].set(free_mask)
    b = jnp.zeros((n_pad, kcols), dtype).at[:ndof, :].set(rhs_cols)
    d_s = jax.device_put(d, NamedSharding(mesh, P(None, "tp")))
    m_s = jax.device_put(m, NamedSharding(mesh, P("tp")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("tp", None)))
    x, it, rel = _sharded_cg_block(
        d_s, m_s, b_s, jnp.asarray(tol, dtype),
        jnp.asarray(max_iter, jnp.int32),
        offsets=tuple(int(o) for o in layout.offsets), halo=halo,
        mesh=mesh)
    return x[:ndof, :], it, rel


@partial(jax.jit, static_argnames=("offsets", "halo", "mesh", "n_rec",
                                   "record_every", "use_beta"))
def _sharded_central(d_s, m_s, mask_s, loads_s, amp, dt, alpha, beta,
                     probe_owner, probe_lidx, offsets: tuple, halo: int,
                     mesh: Mesh, n_rec: int, record_every: int,
                     use_beta: bool):
    """Whole explicit time history inside ONE shard_map program: each step
    is a two-ppermute halo exchange + local stencil matvec + local
    pointwise update; snapshot probes/energies reduce with psum."""

    def body_fn(d_loc, m_loc, mask_loc, loads_loc, amp, dt, alpha, beta,
                probe_owner, probe_lidx):
        nr = loads_loc.shape[0]
        idx = jax.lax.axis_index("tp")

        def k_apply(u_loc):
            u_halo = _halo_exchange(u_loc, halo, "tp")
            return _local_matvec(offsets, d_loc, u_halo, halo, nr)

        inv_m = jnp.where(m_loc > 0, 1.0 / m_loc, 0.0)
        dt2 = dt * dt
        n_total = amp.shape[0]

        def force(i):
            return amp[jnp.minimum(i, n_total - 1)] * loads_loc

        def residual(i, u, v_lag):
            cu = alpha * (m_loc * v_lag)
            if use_beta:
                cu = cu + beta * k_apply(v_lag)
            return force(i) - k_apply(u) - cu

        u0 = jnp.zeros_like(loads_loc)
        a0 = inv_m * residual(0, u0, u0) * mask_loc
        u_prev0 = u0 + 0.5 * dt2 * a0

        def one_step(i, u, u_prev):
            v_lag = (u - u_prev) / dt
            u_next = (2.0 * u - u_prev
                      + dt2 * inv_m * residual(i, u, v_lag)) * mask_loc
            return u_next, u

        def probe_vals(u):
            mine = jnp.where(probe_owner == idx, u[probe_lidx], 0.0)
            return jax.lax.psum(mine, "tp")

        def chunk(carry, _):
            u, u_prev, i0 = carry

            def body(j, c):
                uu, up = c
                return one_step(i0 + j, uu, up)

            u, u_prev = jax.lax.fori_loop(0, record_every, body,
                                          (u, u_prev))
            i_next = i0 + record_every
            u_peek, _ = one_step(i_next, u, u_prev)
            v = (u_peek - u_prev) / (2.0 * dt)
            ke = 0.5 * jax.lax.psum(jnp.sum(m_loc * mask_loc * v * v),
                                    "tp")
            se = 0.5 * jax.lax.psum(jnp.dot(u, k_apply(u)), "tp")
            return (u, u_prev, i_next), (probe_vals(u), probe_vals(v),
                                         ke, se)

        (u, u_prev, _), recs = jax.lax.scan(
            chunk, (u0, u_prev0, jnp.zeros((), jnp.int32)), None,
            length=n_rec)
        v_final = (u - u_prev) / dt
        return recs, u, v_final

    sm = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp"), P("tp"), P(), P(),
                  P(), P(), P(), P()),
        out_specs=((P(), P(), P(), P()), P("tp"), P("tp")),
        check_vma=False,
    )
    return sm(d_s, m_s, mask_s, loads_s, amp, dt, alpha, beta,
              probe_owner, probe_lidx)


def solve_transient_sharded(
    problem,
    dt: float,
    n_steps: int,
    mesh: Mesh,
    amplitude: Optional[np.ndarray] = None,
    damping=(0.0, 0.0),
    record_every: int = 1,
    probe_dofs: Optional[np.ndarray] = None,
    data=None,
):
    """Distributed explicit transient dynamics: DOF row blocks sharded
    over "tp", each step exchanging O(bandwidth) halos over ICI — meshes
    larger than one device's HBM integrate at per-step cost ~(local
    matvec + 2 ppermutes).  Contract mirrors solvers.dynamics
    solve_transient(method="central") and is asserted against it on the
    virtual-device mesh (tests/test_dia_sharded.py).
    """
    from ..ops.cg import stiffness_coefficients
    from ..ops.dia import assemble_dia, dia_layout
    from ..ops.mass import lumped_mass
    from ..solvers.dynamics import TransientResult

    if n_steps % record_every:
        raise ValueError("n_steps must be a multiple of record_every")
    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    ndof = problem.ndof
    layout = dia_layout(np.asarray(data.dof_map), ndof)
    s = stiffness_coefficients(data, problem.material, 1.0)
    diags = assemble_dia(layout, s, data.gvec)

    tp = mesh.shape["tp"]
    n_pad = _pad_rows(ndof, tp)
    nr = n_pad // tp
    halo = int(layout.bandwidth)
    if halo > nr:
        raise ValueError(
            f"bandwidth {halo} exceeds the {nr}-row shard; use fewer shards")

    mask = data.free_mask
    m = lumped_mass(data, problem.material) * mask + (1.0 - mask)
    d_s, mask_s, loads_s, _ = shard_dia(layout, diags, mesh, mask,
                                        data.loads)
    m_pad = jnp.ones((n_pad,), dtype).at[:ndof].set(m)
    m_s = jax.device_put(m_pad, NamedSharding(mesh, P("tp")))

    amplitude = (np.ones(n_steps) if amplitude is None
                 else np.asarray(amplitude, dtype=float))
    if amplitude.shape != (n_steps,):
        raise ValueError(f"amplitude must have shape ({n_steps},)")
    probe = (np.arange(ndof) if probe_dofs is None
             else np.asarray(probe_dofs, dtype=int))
    probe_owner = jnp.asarray(probe // nr, jnp.int32)
    probe_lidx = jnp.asarray(probe % nr, jnp.int32)

    alpha, beta = float(damping[0]), float(damping[1])
    n_rec = n_steps // record_every
    recs, u_f, v_f = _sharded_central(
        d_s, m_s, mask_s, loads_s, jnp.asarray(amplitude, dtype),
        jnp.asarray(dt, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(beta, dtype), probe_owner, probe_lidx,
        offsets=tuple(int(o) for o in layout.offsets), halo=halo,
        mesh=mesh, n_rec=n_rec, record_every=record_every,
        use_beta=beta != 0.0)
    us, vs, kes, ses = jax.device_get(recs)
    u_f, v_f = jax.device_get((u_f[:ndof], v_f[:ndof]))
    return TransientResult(
        times=dt * record_every * np.arange(1, n_rec + 1),
        displacements=np.asarray(us), velocities=np.asarray(vs),
        kinetic_energy=np.asarray(kes), strain_energy=np.asarray(ses),
        u_final=np.asarray(u_f), v_final=np.asarray(v_f),
    )


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
