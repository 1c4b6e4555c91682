"""Banded algebraic multigrid: a TPU-native preconditioner for DIA systems.

Jacobi-PCG on large meshes is limited by CONDITIONING, not matvec speed
(see TECHNICAL_README; the 40k-DOF grid solve spends hundreds of CG
iterations).  Classic remedies (IC(0), SSOR, Gauss-Seidel) need triangular
solves — sequential, hostile to the TPU's vector units.  This module
builds a multigrid V-cycle that stays ENTIRELY in the banded DIA
representation, using only operations XLA compiles well:

  * coarsening: pairwise aggregation along the DOF index.  For banded
    matrices this is closed under the representation: a fine entry
    A[i, i+o] with i = 2I + p aggregates into coarse entry
    A_c[I, I + (o+p)//2], so the coarse offsets are {floor(o/2),
    ceil(o/2)} of the fine ones (STATIC, computed at trace time) and each
    coarse diagonal is a sum of strided slices of fine diagonals — one
    vectorized reshape/scatter, no gathers;
  * smoothing: damped Jacobi (omega = 2/3), i.e. pure DIA matvecs;
  * prolongation / restriction: piecewise-constant pairs — a reshape-sum
    down, a repeat up (P^T = R, so the V-cycle is symmetric and PCG-safe);
  * coarsest level (<= ~512 DOFs): ONE dense Cholesky factorization,
    reused by every V-cycle application of the CG solve.

Boundary conditions enter by masking the operator once at the fine level
(d'_k[i] = d_k[i] * m[i] * m[i+o], unit diagonal on fixed rows), so every
coarse operator automatically respects them.

No counterpart exists in the reference (its largest system is 8x8 dense);
this is the scaling story for production-size meshes (SURVEY §7 north
star).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dia import DiaLayout, dia_matvec

_OMEGA = 2.0 / 3.0
_SMOOTH_LEVELS = 2  # coarsenings that use smoothed aggregation (see below)


class MGLevel(NamedTuple):
    offsets: Tuple[int, ...]   # static diagonal offsets of this level
    ndof: int                  # static level size
    diags: jnp.ndarray         # (nd, ndof) level operator
    inv_diag: jnp.ndarray      # (ndof,) 1 / diag(A), for Jacobi smoothing
    smoothed: bool = False     # transfers below this level are SA-smoothed


class MGHierarchy(NamedTuple):
    levels: Tuple[MGLevel, ...]
    chol: jnp.ndarray          # coarsest-level Cholesky factor (lower)
    components: int            # DOFs per node (static)
    smooth: bool               # smoothed-aggregation transfers


def _level_layout(offsets: Tuple[int, ...], ndof: int) -> DiaLayout:
    return DiaLayout(offsets=np.asarray(offsets), entry_slot=None,
                     ndof=ndof, bandwidth=max(max(abs(o) for o in offsets), 1))


def mask_dia(offsets: Tuple[int, ...], diags: jnp.ndarray,
             free_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked-BC operator in DIA form: M A M + (I - M).

    d'_k[i] = d_k[i] * m[i] * m[i + o_k]; the offset-0 diagonal gains
    (1 - m[i]) so fixed rows become identity (cf. ops/linalg.masked_solve).
    """
    ndof = diags.shape[1]
    m_pad = jnp.pad(free_mask, (ndof, ndof), constant_values=0.0)
    rows = []
    for k, o in enumerate(offsets):
        mj = jax.lax.dynamic_slice(m_pad, (ndof + int(o),), (ndof,))
        row = diags[k] * free_mask * mj
        if o == 0:
            row = row + (1.0 - free_mask)
        rows.append(row)
    return jnp.stack(rows)


def dia_rowscale(diags: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """D_scale @ A in DIA form: every row i scaled by scale[i]."""
    return diags * scale[None, :]


def dia_mul(offsets_a: Tuple[int, ...], da: jnp.ndarray,
            offsets_b: Tuple[int, ...], db: jnp.ndarray, ndof: int
            ) -> Tuple[Tuple[int, ...], jnp.ndarray]:
    """(A @ B) of two DIA operators: static offset algebra, strided reads.

    (A B)[i, i + oa + ob] += A[i, i+oa] * B[i+oa, i+oa+ob], so each output
    diagonal oa+ob accumulates da[oa] * shift(db[ob], oa) — a static slice
    of the zero-padded db row.  Offset count grows (|O_A| x |O_B| sums,
    deduplicated); callers coarsen immediately afterwards, which halves it.
    """
    out_offsets = sorted({oa + ob for oa in offsets_a for ob in offsets_b})
    o_index = {o: i for i, o in enumerate(out_offsets)}
    out = jnp.zeros((len(out_offsets), ndof), da.dtype)
    pad = max(abs(o) for o in offsets_a)
    db_pad = jnp.pad(db, ((0, 0), (pad, pad)))
    # Two ops per oa (a slice of ALL db rows + one batched scatter-add)
    # instead of |O_A| x |O_B| individual ones — trace/compile time on the
    # deeper smoothed levels was otherwise the bottleneck.
    for ka, oa in enumerate(offsets_a):
        shifted_all = jax.lax.dynamic_slice(
            db_pad, (0, pad + oa), (db.shape[0], ndof)
        )
        rows = jnp.asarray([o_index[oa + ob] for ob in offsets_b], jnp.int32)
        out = out.at[rows].add(da[ka][None, :] * shifted_all)
    return tuple(out_offsets), out


def smoothed_operator(offsets: Tuple[int, ...], diags: jnp.ndarray,
                      ndof: int, omega: float = _OMEGA
                      ) -> Tuple[Tuple[int, ...], jnp.ndarray]:
    """S = (I - omega*A*D^-1) A (I - omega*D^-1*A) in DIA form.

    Sandwiching the tentative aggregation with S instead of A IS smoothed
    aggregation: P_s^T A P_s = P_t^T S P_t, because
    P_s = (I - omega D^-1 A) P_t.  S = A - 2*omega*E + omega^2*F with
    E = A D^-1 A (symmetric) and F = A D^-1 A D^-1 A.
    """
    k0 = offsets.index(0)
    inv_d = 1.0 / diags[k0]
    m1 = dia_rowscale(diags, inv_d)                       # D^-1 A
    off_e, e = dia_mul(offsets, diags, offsets, m1, ndof)  # A D^-1 A
    m3 = dia_rowscale(e, inv_d)                            # D^-1 E
    off_f, f = dia_mul(offsets, diags, off_e, m3, ndof)    # A D^-1 E

    out_offsets = tuple(sorted(set(offsets) | set(off_e) | set(off_f)))
    o_index = {o: i for i, o in enumerate(out_offsets)}
    s = jnp.zeros((len(out_offsets), ndof), diags.dtype)
    for k, o in enumerate(offsets):
        s = s.at[o_index[o]].add(diags[k])
    for k, o in enumerate(off_e):
        s = s.at[o_index[o]].add(-2.0 * omega * e[k])
    for k, o in enumerate(off_f):
        s = s.at[o_index[o]].add(omega * omega * f[k])
    return out_offsets, s


def _agg_index(i: np.ndarray, components: int) -> np.ndarray:
    """Static aggregation map: merge ADJACENT NODES, keep vector components
    separate.  For `components` DOFs per node, fine dof i = C*node + c
    aggregates to coarse dof C*(node//2) + c.  With components=1 this is
    plain pairwise index aggregation."""
    c = i % components
    node = i // components
    return components * (node // 2) + c


def coarsen(offsets: Tuple[int, ...], diags: jnp.ndarray, ndof: int,
            components: int = 1) -> Tuple[Tuple[int, ...], jnp.ndarray, int]:
    """One aggregation Galerkin coarsening P^T A P in DIA form.

    The aggregation pattern is periodic with period B = 2*components, so a
    fine entry A[i, i+o] lands on a coarse offset determined ONLY by the
    residue r = i % B — each (offset, residue) pair contributes one strided
    slice of a fine diagonal to one coarse diagonal.  Everything is static
    index algebra; the device work is reshapes and adds.
    """
    B = 2 * components
    n_c_nodes = -(-ndof // B)          # coarse nodes after padding
    n_pad = B * n_c_nodes
    n_c = components * n_c_nodes

    # Static (residue, offset) -> coarse offset table.
    r = np.arange(B)
    contribs = {}  # (offset o, residue r) -> (coarse_offset, coarse_phase)
    coarse_offsets = set()
    for o in offsets:
        ji = r + o
        j_c = _agg_index(ji, components)
        i_c = _agg_index(r, components)
        for rr in range(B):
            c_off = int(j_c[rr] - i_c[rr])
            contribs[(o, rr)] = (c_off, int(i_c[rr]))
            coarse_offsets.add(c_off)
    coarse_offsets = tuple(sorted(coarse_offsets))
    c_index = {c: i for i, c in enumerate(coarse_offsets)}

    d_pad = jnp.zeros((diags.shape[0], n_pad), diags.dtype).at[:, :ndof].set(diags)
    out = jnp.zeros((len(coarse_offsets), n_c), diags.dtype)
    for k, o in enumerate(offsets):
        blocks = d_pad[k].reshape(n_c_nodes, B)   # column rr = residue class
        for rr in range(B):
            c_off, phase = contribs[(o, rr)]
            # Residue rr of coarse block I lands at coarse dof
            # components*I + phase -> strided slice [phase::components].
            out = out.at[c_index[c_off], phase::components].add(blocks[:, rr])
    return coarse_offsets, out, n_c


def _dense_from_dia(offsets: Tuple[int, ...], diags: jnp.ndarray, ndof: int
                    ) -> jnp.ndarray:
    a = jnp.zeros((ndof, ndof), diags.dtype)
    i = jnp.arange(ndof)
    for k, o in enumerate(offsets):
        j = i + int(o)
        valid = jnp.logical_and(j >= 0, j < ndof)
        a = a.at[i, jnp.clip(j, 0, ndof - 1)].add(
            jnp.where(valid, diags[k], 0.0)
        )
    return a


def build_hierarchy(layout: DiaLayout, diags: jnp.ndarray,
                    free_mask: jnp.ndarray, coarsest: int = 512,
                    max_levels: int = 12, components: int = 1,
                    smooth: bool = True) -> MGHierarchy:
    """Construct the multigrid hierarchy (trace-time structure, traced
    values).  Called once per assembled operator; every V-cycle of the CG
    solve reuses it, including the coarsest-level Cholesky factor.

    components: DOFs per node (the problem dimension) — aggregation merges
    adjacent NODES and keeps vector components separate, which couples far
    more strongly than blind index pairing for vector-valued problems.

    smooth: smoothed aggregation (Vanek-style) on the FINEST level(s).
    Tentative piecewise-constant aggregates give h-DEPENDENT convergence
    (measured: 43 -> 234 PCG iterations from 6.4k to 40k DOFs); smoothing
    the prolongator with one damped-Jacobi pass sharpens the interpolation
    where it matters most.  The coarse operator stays banded —
    P_s^T A P_s == P_t^T S P_t with S from smoothed_operator() — but its
    diagonal count grows ~3x per smoothed coarsening, so smoothing is
    applied only for the first `_SMOOTH_LEVELS` coarsenings (the
    stencil-collapse alternative, lumping dropped diagonals onto the main
    diagonal, destroys positive-definiteness — measured, coarse diagonals
    went negative and Cholesky NaN'd)."""
    offsets = tuple(int(o) for o in layout.offsets)
    ndof = layout.ndof
    diags = mask_dia(offsets, diags, free_mask)

    levels: List[MGLevel] = []
    for li in range(max_levels):
        k0 = offsets.index(0)
        # Aggregation pads odd levels with all-zero rows; give those an
        # identity diagonal (their off-diagonals are zero by construction)
        # or the Jacobi smoother divides by zero.
        diag = diags[k0]
        diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
        diags = diags.at[k0].set(diag)
        sm_here = bool(smooth and li < _SMOOTH_LEVELS)
        levels.append(MGLevel(offsets=offsets, ndof=ndof, diags=diags,
                              inv_diag=1.0 / diag, smoothed=sm_here))
        if ndof <= coarsest:
            break
        if sm_here:
            off_s, d_s = smoothed_operator(offsets, diags, ndof)
        else:
            off_s, d_s = offsets, diags
        offsets, diags, ndof = coarsen(off_s, d_s, ndof,
                                       components=components)

    a_c = _dense_from_dia(levels[-1].offsets, levels[-1].diags,
                          levels[-1].ndof)
    # The Galerkin coarse operator of an SPD fine operator is SPD; a tiny
    # shift guards float32 semi-definiteness from aggregated fixed rows.
    a_c = a_c + 1e-10 * jnp.eye(levels[-1].ndof, dtype=a_c.dtype)
    chol, _ = jax.scipy.linalg.cho_factor(a_c, lower=True)
    return MGHierarchy(levels=tuple(levels), chol=chol,
                       components=components, smooth=smooth)


def _smooth(level: MGLevel, b: jnp.ndarray, x: jnp.ndarray,
            sweeps: int = 1) -> jnp.ndarray:
    lay = _level_layout(level.offsets, level.ndof)
    for _ in range(sweeps):
        r = b - dia_matvec(lay, level.diags, x)
        x = x + _OMEGA * level.inv_diag * r
    return x


def _restrict(r: jnp.ndarray, n_c_nodes: int, components: int) -> jnp.ndarray:
    """P^T r with node-pair aggregation: sum the two fine nodes of each
    coarse node, component-wise."""
    n_pad = 2 * n_c_nodes * components
    r_pad = jnp.zeros((n_pad,), r.dtype).at[: r.shape[0]].set(r)
    return r_pad.reshape(n_c_nodes, 2, components).sum(axis=1).reshape(-1)


def _prolong(e_c: jnp.ndarray, n_f: int, components: int) -> jnp.ndarray:
    """P e_c: inject each coarse node's value into its two fine nodes."""
    e = jnp.repeat(e_c.reshape(-1, components), 2, axis=0).reshape(-1)
    return e[:n_f]


def v_cycle(h: MGHierarchy, b: jnp.ndarray) -> jnp.ndarray:
    """One symmetric V(1,1) cycle, x0 = 0 — the PCG preconditioner apply."""
    levels = h.levels
    n_levels = len(levels)

    # Downsweep: smooth from zero, restrict the residual (static unroll —
    # level shapes differ, so this cannot be a lax loop; n_levels ~ 8).
    comp = h.components

    def transfer_down(lvl: MGLevel, r: jnp.ndarray, n_c_nodes: int):
        """P_s^T r = inject^T((I - omega A D^-1) r) when smoothing."""
        if lvl.smoothed:
            lay = _level_layout(lvl.offsets, lvl.ndof)
            r = r - _OMEGA * dia_matvec(lay, lvl.diags, lvl.inv_diag * r)
        return _restrict(r, n_c_nodes, comp)

    def transfer_up(lvl: MGLevel, e_c: jnp.ndarray):
        """P_s e = (I - omega D^-1 A) inject(e) when smoothing."""
        e = _prolong(e_c, lvl.ndof, comp)
        if lvl.smoothed:
            lay = _level_layout(lvl.offsets, lvl.ndof)
            e = e - _OMEGA * lvl.inv_diag * dia_matvec(lay, lvl.diags, e)
        return e

    xs: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = [b]
    for li in range(n_levels - 1):
        lvl = levels[li]
        x = _OMEGA * lvl.inv_diag * bs[li]        # smooth(b, x=0), one sweep
        r = bs[li] - dia_matvec(_level_layout(lvl.offsets, lvl.ndof),
                                lvl.diags, x)
        xs.append(x)
        bs.append(transfer_down(lvl, r, levels[li + 1].ndof // comp))

    # Coarsest: exact solve with the prefactored Cholesky.
    x_c = jax.scipy.linalg.cho_solve((h.chol, True), bs[-1])

    # Upsweep: correct + post-smooth.
    for li in range(n_levels - 2, -1, -1):
        lvl = levels[li]
        x = xs[li] + transfer_up(lvl, x_c)
        x_c = _smooth(lvl, bs[li], x, sweeps=1)
    return x_c
