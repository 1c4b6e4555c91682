"""Guyan reduction (static condensation): exact superelements for statics,
mass-approximate for dynamics.

Partition DOFs into retained MASTERS m and condensed SLAVES s; with
T = [I; -K_ss^{-1} K_sm],

    K_red = T^T K T = K_mm - K_ms K_ss^{-1} K_sm      (EXACT for statics:
        any load applied at masters gives identical master displacements)
    M_red = T^T M T                                   (Guyan approximation:
        slave inertia is ignored dynamically; low modes whose shapes are
        well-captured by static interpolation stay accurate)
    f_red = T^T f                                     (slave loads carry
        over consistently)

Classic model-order reduction / substructuring — build once, reuse the
small (n_m, n_m) superelement for repeated solves, or hand it to the
dense modal/harmonic machinery.  Fixed DOFs may appear in neither set
(they are eliminated by masking first).  No counterpart exists in the
reference."""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from ..models.problem import TrussProblem


class ReducedModel(NamedTuple):
    k_red: np.ndarray        # (n_m, n_m)
    m_red: np.ndarray        # (n_m, n_m)
    t: np.ndarray            # (n_free, n_m) recovery basis (master->free)
    master_dofs: np.ndarray  # (n_m,) global DOF indices
    free_dofs: np.ndarray    # (n_free,) global DOF order of t's rows

    def expand(self, u_m: np.ndarray, ndof: int) -> np.ndarray:
        """(n_m,) master displacements -> (ndof,) full vector (zeros on
        fixed DOFs; slaves recovered by static interpolation)."""
        u = np.zeros(ndof)
        u[self.free_dofs] = self.t @ np.asarray(u_m).reshape(-1)
        return u


def _partition(problem: TrussProblem, master_dofs, data):
    """Shared setup for Guyan / Craig-Bampton: validate masters, build
    the free-block partition, and assemble K_ff + lumped mass on the
    HOST (numpy float64 — the whole reduction is LAPACK-sized and must
    not pay a remote TPU compile, round-3 VERDICT #1; ops/host.py is the
    pinned mirror of the device assembly)."""
    if data is not None:
        # The host rewrite reads problem arrays directly; a custom
        # ProblemData (e.g. replaced loads) would be silently ignored —
        # reduction never used loads, but refuse rather than mislead.
        raise ValueError("reduction assembles on the host from the "
                         "problem itself; the data argument is no "
                         "longer consumed — drop it")
    from ..ops import host as H
    from .newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"reduction is dense-only ({problem.ndof} DOFs > "
            f"{DENSE_DOF_LIMIT}); condense a substructure, not the "
            "full large mesh")
    free_idx = np.asarray(problem.free_fixed()[0])
    masters = np.asarray(master_dofs, dtype=int)
    if np.unique(masters).size != masters.size:
        raise ValueError("master_dofs contains duplicates")
    if np.setdiff1d(masters, free_idx).size:
        raise ValueError("master_dofs must be free DOFs")
    pos = {int(d): i for i, d in enumerate(free_idx)}
    m_loc = np.array([pos[int(d)] for d in masters])
    s_loc = np.setdiff1d(np.arange(free_idx.size), m_loc)

    k_ff = H.host_stiffness(problem)[np.ix_(free_idx, free_idx)]
    m_all = H.host_lumped_mass(problem)
    return (free_idx, masters, m_loc, s_loc, k_ff, m_all[free_idx])


def guyan_reduce(problem: TrussProblem,
                 master_dofs: Sequence[int],
                 data=None) -> ReducedModel:
    """Condense the free DOFs onto the given masters (global DOF ids;
    must be free)."""
    free_idx, masters, m_loc, s_loc, k_ff, m_diag = _partition(
        problem, master_dofs, data)

    k_mm = k_ff[np.ix_(m_loc, m_loc)]
    k_ms = k_ff[np.ix_(m_loc, s_loc)]
    k_ss = k_ff[np.ix_(s_loc, s_loc)]
    # T maps master displacements to ALL free DOFs.
    phi_s = -np.linalg.solve(k_ss, k_ms.T)          # (n_s, n_m)
    t = np.zeros((free_idx.size, m_loc.size))
    t[m_loc, np.arange(m_loc.size)] = 1.0
    t[s_loc] = phi_s
    k_red = k_mm + k_ms @ phi_s                     # == T^T K T, symmetric
    k_red = 0.5 * (k_red + k_red.T)
    m_red = t.T @ (m_diag[:, None] * t)
    m_red = 0.5 * (m_red + m_red.T)
    return ReducedModel(k_red=k_red, m_red=m_red, t=t,
                        master_dofs=masters, free_dofs=free_idx)


def reduce_loads(model: ReducedModel, loads: np.ndarray) -> np.ndarray:
    """(ndof,) loads -> (n_m,) consistent reduced loads f_red = T^T f."""
    return model.t.T @ np.asarray(loads).reshape(-1)[model.free_dofs]


def craig_bampton(problem: TrussProblem,
                  master_dofs: Sequence[int],
                  n_modes: int = 4,
                  data=None) -> ReducedModel:
    """Craig-Bampton reduction: Guyan's static basis AUGMENTED with the
    first n_modes fixed-interface normal modes of the slave block.

    T = [[I, 0], [-K_ss^{-1} K_sm, Phi_s]], Phi_s the mass-normalized
    eigenvectors of (K_ss, M_ss).  Statics stay EXACT (the Guyan columns
    are untouched); dynamics improve dramatically — the slave inertia
    Guyan drops re-enters through the modal coordinates, so reduced
    frequencies converge with a handful of interface modes instead of a
    dense master set (tests/test_reduction.py quantifies the gap).

    The extra columns are generalized coordinates: ReducedModel.t maps
    [u_m; q] to the free DOFs and expand() recovers the full vector.
    """
    free_idx, masters, m_loc, s_loc, k_ff, m_diag = _partition(
        problem, master_dofs, data)
    n_modes = min(n_modes, s_loc.size)

    k_ms = k_ff[np.ix_(m_loc, s_loc)]
    k_ss = k_ff[np.ix_(s_loc, s_loc)]
    phi_stat = -np.linalg.solve(k_ss, k_ms.T)        # (n_s, n_m)

    # Fixed-interface modes of (K_ss, diag(m_s)).
    d = np.sqrt(m_diag[s_loc])
    b = k_ss / d[:, None] / d[None, :]
    w2, y = np.linalg.eigh(0.5 * (b + b.T))
    phi_modes = (y[:, :n_modes] / d[:, None])        # mass-normalized

    n_m = m_loc.size
    t = np.zeros((free_idx.size, n_m + n_modes))
    t[m_loc, np.arange(n_m)] = 1.0
    t[s_loc, :n_m] = phi_stat
    t[s_loc, n_m:] = phi_modes
    k_red = t.T @ (k_ff @ t)
    m_red = t.T @ (m_diag[:, None] * t)
    k_red = 0.5 * (k_red + k_red.T)
    m_red = 0.5 * (m_red + m_red.T)
    return ReducedModel(k_red=k_red, m_red=m_red, t=t,
                        master_dofs=masters, free_dofs=free_idx)


# ---------------------------------------------------------------------
# Dense-matrix cores: the same condensation on an explicitly assembled
# (K, M) pair — consistent (dense) mass supported, so the continuum
# (plane/solid) and frame families reduce with their own mass models
# instead of borrowing the truss lumping.  The truss entry points above
# keep their lumped host path (behaviorally identical: for a diagonal
# M, T^T M T == T^T diag(m) T).


def _partition_dense(k, m, fixed_dofs, master_dofs):
    ndof = k.shape[0]
    free_idx = np.setdiff1d(np.arange(ndof),
                            np.asarray(fixed_dofs, dtype=int))
    masters = np.asarray(master_dofs, dtype=int)
    if np.unique(masters).size != masters.size:
        raise ValueError("master_dofs contains duplicates")
    if np.setdiff1d(masters, free_idx).size:
        raise ValueError("master_dofs must be free DOFs")
    pos = {int(d): i for i, d in enumerate(free_idx)}
    m_loc = np.array([pos[int(d)] for d in masters])
    s_loc = np.setdiff1d(np.arange(free_idx.size), m_loc)
    k_ff = np.asarray(k)[np.ix_(free_idx, free_idx)]
    m_ff = np.asarray(m)[np.ix_(free_idx, free_idx)]
    return free_idx, masters, m_loc, s_loc, k_ff, m_ff


def guyan_reduce_dense(k, m, fixed_dofs, master_dofs) -> ReducedModel:
    """Guyan condensation of an explicit (K, M) pair (module
    docstring); M may be consistent (dense)."""
    free_idx, masters, m_loc, s_loc, k_ff, m_ff = _partition_dense(
        k, m, fixed_dofs, master_dofs)
    k_ms = k_ff[np.ix_(m_loc, s_loc)]
    k_ss = k_ff[np.ix_(s_loc, s_loc)]
    phi_s = -np.linalg.solve(k_ss, k_ms.T)
    t = np.zeros((free_idx.size, m_loc.size))
    t[m_loc, np.arange(m_loc.size)] = 1.0
    t[s_loc] = phi_s
    k_red = k_ff[np.ix_(m_loc, m_loc)] + k_ms @ phi_s
    m_red = t.T @ (m_ff @ t)
    return ReducedModel(k_red=0.5 * (k_red + k_red.T),
                        m_red=0.5 * (m_red + m_red.T), t=t,
                        master_dofs=masters, free_dofs=free_idx)


def craig_bampton_dense(k, m, fixed_dofs, master_dofs,
                        n_modes: int = 4) -> ReducedModel:
    """Craig-Bampton on an explicit (K, M) pair: Guyan static basis +
    fixed-interface normal modes of the CONSISTENT slave block
    (scipy generalized eigh, mass-normalized)."""
    import scipy.linalg

    free_idx, masters, m_loc, s_loc, k_ff, m_ff = _partition_dense(
        k, m, fixed_dofs, master_dofs)
    n_modes = min(int(n_modes), s_loc.size)
    k_ms = k_ff[np.ix_(m_loc, s_loc)]
    k_ss = k_ff[np.ix_(s_loc, s_loc)]
    phi_stat = -np.linalg.solve(k_ss, k_ms.T)
    _, phi_modes = scipy.linalg.eigh(
        k_ss, m_ff[np.ix_(s_loc, s_loc)],
        subset_by_index=[0, max(n_modes - 1, 0)])
    phi_modes = phi_modes[:, :n_modes]
    n_m = m_loc.size
    t = np.zeros((free_idx.size, n_m + n_modes))
    t[m_loc, np.arange(n_m)] = 1.0
    t[s_loc, :n_m] = phi_stat
    t[s_loc, n_m:] = phi_modes
    k_red = t.T @ (k_ff @ t)
    m_red = t.T @ (m_ff @ t)
    return ReducedModel(k_red=0.5 * (k_red + k_red.T),
                        m_red=0.5 * (m_red + m_red.T), t=t,
                        master_dofs=masters, free_dofs=free_idx)


def reduce_model(problem, master_dofs, method: str = "guyan",
                 n_modes: int = 4) -> ReducedModel:
    """Family-dispatching reduction: TrussProblem rides the lumped
    host path above; plane/solid/frame documents condense their OWN
    consistent dense (K, M) through the dense cores."""
    from ..models.problem import TrussProblem

    if isinstance(problem, TrussProblem):
        if method == "guyan":
            return guyan_reduce(problem, master_dofs)
        if method == "craig_bampton":
            return craig_bampton(problem, master_dofs, n_modes=n_modes)
        raise ValueError('reduction method must be "guyan" or '
                         '"craig_bampton"')
    from .newton import DENSE_DOF_LIMIT

    if problem.ndof > DENSE_DOF_LIMIT:
        raise ValueError(
            f"reduction is dense-only ({problem.ndof} DOFs > "
            f"{DENSE_DOF_LIMIT}); condense a substructure, not the "
            "full large mesh")
    from ..models.frame import FrameProblem
    from ..models.plane import PlaneProblem
    from ..models.solid import SolidProblem

    from ..models.plate import PlateProblem

    if isinstance(problem, PlaneProblem):
        from ..models.plane import plane_matrices as mats
    elif isinstance(problem, SolidProblem):
        from ..models.solid import solid_matrices as mats
    elif isinstance(problem, FrameProblem):
        from ..models.frame import frame_matrices as mats
    elif isinstance(problem, PlateProblem):
        from ..models.plate import plate_matrices as mats
    else:
        from ..models.frame3d import SpaceFrameProblem
        from ..models.shell import ShellProblem

        if isinstance(problem, SpaceFrameProblem):
            from ..models.frame3d import space_frame_matrices as mats
        elif isinstance(problem, ShellProblem):
            from ..models.shell import shell_matrices

            def mats(p):
                # Ridge-regularize the mass: the zero-mass drilling
                # direction makes the raw shell pencil indefinite for
                # the CB fixed-interface eigensolve
                # (models/shell.shell_modal docstring).
                k, m = shell_matrices(p)
                m = m + 1e-10 * np.diag(m).max() * np.eye(m.shape[0])
                return k, m
        else:
            raise TypeError("reduce_model needs a Truss/Plane/Solid/"
                            "Frame/SpaceFrame/Shell/Plate problem, "
                            f"got {type(problem).__name__}")
    k, m = mats(problem)
    if method == "guyan":
        return guyan_reduce_dense(k, m, problem.fixed_dofs,
                                  master_dofs)
    if method == "craig_bampton":
        return craig_bampton_dense(k, m, problem.fixed_dofs,
                                   master_dofs, n_modes=n_modes)
    raise ValueError('reduction method must be "guyan" or '
                     '"craig_bampton"')
