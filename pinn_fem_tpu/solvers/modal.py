"""Modal analysis: K phi = omega^2 M phi, dense or banded, differentiable.

An extension beyond the reference (no mass, no dynamics — SURVEY §7.3).
Two paths, selected like the static solvers:

  * dense (ndof <= DENSE_DOF_LIMIT): restrict K and M to the free DOFs,
    reduce the generalized problem to standard form and call eigh.  With
    lumped (diagonal) mass the reduction is a pointwise D^{-1/2} scaling;
    with consistent mass it is a Cholesky congruence L^{-1} K L^{-T}.
    eigh is DIFFERENTIABLE in JAX, so natural frequencies are themselves
    a training signal: a density MLP — physics-inert in the reference and
    in static PINN solves — receives gradients through the spectrum
    (examples/modal_identification.py identifies rho(x) from measured
    frequencies).
  * banded (large meshes): inverse subspace iteration with Rayleigh-Ritz
    on the DIA operator — block solves K Y = M X by (vmapped) banded PCG,
    M-orthonormalization, and a small dense generalized eigenproblem per
    iteration.  Smallest modes converge first, which is exactly the end
    structural analysis wants.

Float32 verification design (measured on a 40k-DOF strip with
lambda_1/||K|| ~ 1.4e-7): the Kv-based `residuals` field has an
irreducible float32 floor ~ eps32 ||K|| sqrt(n) / lambda — computing
K v for a mode that small cancels every digit float32 has, so AT the
floor the metric measures the check's own noise, not eigenvalue error
(the Ritz values themselves were verified stable across independent
random subspaces and, at 2.5k DOFs, within 0.6% of the dense path).
`ok` therefore accepts floor-level residuals but, on the banded path,
additionally requires the Ritz values to have converged over the final
subspace iteration — the indicator that stays meaningful below the
floor.  (The Rayleigh-Ritz projection uses Y^T(MX), algebraically
K Y = MX by the solve's construction; measured equal in accuracy to the
explicit Y^T K Y form and one banded matvec per iteration cheaper.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.problem import TrussProblem
from ..ops.assembly import assemble_system
from ..ops.mass import consistent_mass, lumped_mass


class ModalResult(NamedTuple):
    eigenvalues: np.ndarray   # (n_modes,) omega^2, ascending
    omegas: np.ndarray        # (n_modes,) rad/s
    frequencies: np.ndarray   # (n_modes,) Hz
    shapes: np.ndarray        # (ndof, n_modes), zeros on fixed DOFs,
                              # M-orthonormal on the free block
    residuals: np.ndarray     # (n_modes,) ||K v - lam M v|| / (lam ||M v||)
    ok: bool = True           # all residuals below the trust threshold
                              # (False: float32 could not resolve the
                              # lowest modes — see module docstring)


def _dense_eigensolve(k_ff, m_ff_or_diag, n_modes: int, lumped: bool):
    """Smallest generalized eigenpairs on the free block (traced)."""
    if lumped:
        d = jnp.sqrt(m_ff_or_diag)
        inv_d = 1.0 / d
        b = inv_d[:, None] * k_ff * inv_d[None, :]
        w, y = jnp.linalg.eigh(b)
        v = inv_d[:, None] * y
    else:
        lo = jnp.linalg.cholesky(m_ff_or_diag)
        li_k = jax.scipy.linalg.solve_triangular(lo, k_ff, lower=True)
        b = jax.scipy.linalg.solve_triangular(
            lo, li_k.T, lower=True).T
        b = 0.5 * (b + b.T)
        w, y = jnp.linalg.eigh(b)
        v = jax.scipy.linalg.solve_triangular(lo.T, y, lower=False)
    return w[:n_modes], v[:, :n_modes]


def modal_eigenvalues(problem: TrussProblem, n_modes: int = 6,
                      lumped: bool = True, data=None,
                      material=None) -> jnp.ndarray:
    """Traced smallest eigenvalues omega^2 — the differentiable core
    (gradients flow to material parameters, including DENSITY).

    `material` overrides problem.material so parameter pytrees can be
    traced through (frequency-based identification,
    examples/modal_identification.py).  Shape construction is dead code
    under jit (XLA eliminates it) so this simply forwards to
    modal_eigenpairs."""
    return modal_eigenpairs(problem, n_modes, lumped, data, material)[0]


def modal_eigenpairs(problem: TrussProblem, n_modes: int = 6,
                     lumped: bool = True, data=None, material=None,
                     prestress_u=None):
    """Traced (omega^2, shapes) — the differentiable core with mode shapes.

    Shapes are (ndof, n_modes), zero on fixed DOFs, M-orthonormal on the
    free block, sign arbitrary (eigenvector sign is not differentiable-
    meaningful; compare sign-invariant quantities such as phi^2 at sensor
    DOFs — see examples/modal_identification.py, where shape data resolves
    the spectrum-only ill-posedness of density identification).

    `prestress_u` adds the initial-stress stiffness K_g(u0) of a static
    equilibrium state (ops/geometric.py): tension raises transverse
    frequencies (taut string), compression lowers them toward the buckling
    point — the frequency-vs-load curve hits zero exactly at the
    linearized critical load (solvers/buckling.py)."""
    data = data if data is not None else problem.to_device()
    material = material if material is not None else problem.material
    free_idx = jnp.asarray(problem.free_fixed()[0])
    dtype = data.loads.dtype
    k = assemble_system(data, material, jnp.zeros(problem.ndof, dtype))[0]
    if prestress_u is not None:
        from ..ops.geometric import assemble_geometric, element_axial_forces

        n_e = element_axial_forces(data, material,
                                   jnp.asarray(prestress_u, dtype))
        k = k + assemble_geometric(data, n_e)
    k_ff = k[jnp.ix_(free_idx, free_idx)]
    if lumped:
        m_f = lumped_mass(data, material)[free_idx]
        w, v = _dense_eigensolve(k_ff, m_f, n_modes, lumped=True)
    else:
        m_ff = consistent_mass(data, material)[jnp.ix_(free_idx, free_idx)]
        w, v = _dense_eigensolve(k_ff, m_ff, n_modes, lumped=False)
    shapes = jnp.zeros((problem.ndof, n_modes), dtype).at[free_idx].set(v)
    return w, shapes


def _subspace_iteration(layout, kd, m_diag, mask, n_modes, n_iter, cg_tol,
                        seed, mesh=None):
    """Inverse subspace iteration on the banded operator (lumped mass).

    `mesh`: optional jax.sharding.Mesh — the block solves K Y = M X (the
    dominant cost: k banded PCG solves per iteration) distribute their
    DOF axis over the mesh's "tp" row blocks with ppermute halo
    exchanges (parallel/dia_sharded.py); the Rayleigh-Ritz projections
    stay replicated (O(ndof * k) work, negligible next to the solves)."""
    from ..ops.dia import dia_cg_solve

    k = min(2 * n_modes + 4, int(jnp.sum(mask)))
    ndof = layout.ndof
    x = jax.random.normal(jax.random.PRNGKey(seed), (ndof, k),
                          dtype=m_diag.dtype) * mask[:, None]

    if mesh is not None:
        from ..parallel.dia_sharded import dia_cg_solve_sharded_block

        def solve_col(b_cols, _x0):
            # All k block solves in ONE sharded program: every halo
            # exchange moves all columns' ghosts together and the CG
            # scalars batch into (k,) psums (dia_cg_solve_sharded_block).
            return dia_cg_solve_sharded_block(layout, kd, b_cols, mask,
                                              mesh, tol=cg_tol,
                                              max_iter=40 * ndof)[0]
    else:
        solve_col = jax.vmap(
            lambda b, x0: dia_cg_solve(layout, kd, b, mask, tol=cg_tol,
                                       max_iter=40 * ndof, x0=x0,
                                       use_pallas=False)[0],
            in_axes=(1, 1), out_axes=1,
        )

    w = w_prev = None
    y = x
    for _ in range(n_iter):
        rhs = m_diag[:, None] * y
        y = solve_col(rhs, y)                          # K^-1 M X
        w_prev = w
        # Rayleigh-Ritz in the M inner product: K y = rhs by the solve's
        # construction, so Y^T K Y = Y^T rhs — A/B-measured equal in
        # accuracy to the explicit Y^T (K Y) form (module docstring) and
        # one banded matvec per iteration cheaper.
        a_r = y.T @ rhs
        a_r = 0.5 * (a_r + a_r.T)
        m_r = y.T @ (m_diag[:, None] * y)
        m_r = 0.5 * (m_r + m_r.T)
        lo = jnp.linalg.cholesky(m_r + 1e-12 * jnp.trace(m_r)
                                 * jnp.eye(k, dtype=y.dtype))
        b = jax.scipy.linalg.solve_triangular(lo, a_r, lower=True)
        b = jax.scipy.linalg.solve_triangular(lo, b.T, lower=True).T
        b = 0.5 * (b + b.T)
        w, q = jnp.linalg.eigh(b)
        y = y @ jax.scipy.linalg.solve_triangular(lo.T, q, lower=False)
    # Ritz-value change over the final iteration: the convergence metric
    # that stays meaningful below the float32 Kv-residual floor.
    if w_prev is None:
        change = jnp.full((n_modes,), jnp.inf)
    else:
        change = jnp.abs(w[:n_modes] - w_prev[:n_modes]) / jnp.maximum(
            jnp.abs(w[:n_modes]), 1e-30)
    return w[:n_modes], y[:, :n_modes], change


def _host_modal(problem, n_modes, lumped, prestress_u) -> ModalResult:
    """Dense modal analysis entirely on the HOST (numpy/LAPACK, float64).

    The default small-problem path (round-3 VERDICT #1): on the TPU
    attachment every new device program pays a 1-3 min remote compile, so
    a 12-DOF eigensolve through jitted eigh cost minutes while LAPACK
    needs microseconds — and float64 removes the f32 Kv-residual floor
    entirely (module docstring).  The TRACED path (modal_eigenpairs)
    remains the differentiable core for identification."""
    import scipy.linalg

    from ..ops import host as H

    free_idx, _ = problem.free_fixed()
    k = H.host_stiffness(problem)
    if prestress_u is not None:
        n_e = H.host_axial_forces(problem, np.asarray(prestress_u))
        k = k + H.host_geometric_stiffness(problem, n_e)
    k_ff = k[np.ix_(free_idx, free_idx)]
    k_ff = 0.5 * (k_ff + k_ff.T)
    if lumped:
        m_f = H.host_lumped_mass(problem)[free_idx]
        d = np.sqrt(m_f)
        b = k_ff / d[:, None] / d[None, :]
        w, y = np.linalg.eigh(0.5 * (b + b.T))
        v = y[:, :n_modes] / d[:, None]               # M-orthonormal
        mv = m_f[:, None] * v
    else:
        m_ff = H.host_consistent_mass(problem)[np.ix_(free_idx, free_idx)]
        m_ff = 0.5 * (m_ff + m_ff.T)
        w, y = scipy.linalg.eigh(k_ff, m_ff)
        v = y[:, :n_modes]                            # M-orthonormal
        mv = m_ff @ v
    w = w[:n_modes]
    num = np.linalg.norm(k_ff @ v - mv * w[None, :], axis=0)
    den = np.maximum(np.abs(w) * np.linalg.norm(mv, axis=0), 1e-300)
    res = num / den
    # Float64 analogue of the f32 floor check below: eigh is backward-
    # stable, so floor-level residuals are check noise, not error.
    row_max = float(np.max(np.sum(np.abs(k_ff), axis=1)))
    floor = (2.3e-16 * row_max * np.sqrt(problem.ndof)
             / np.maximum(np.abs(w), 1e-300))
    ok = bool(np.all(res < np.maximum(1e-8, 10.0 * floor)))
    shapes = np.zeros((problem.ndof, n_modes))
    shapes[free_idx] = v
    noise = 1e-12 * max(float(np.max(np.abs(w))), 1e-300)
    w = np.where((w < 0) & (w > -noise), 0.0, w)
    omegas = np.sqrt(np.maximum(w, 0.0))
    return ModalResult(
        eigenvalues=np.asarray(w), omegas=omegas,
        frequencies=omegas / (2.0 * np.pi),
        shapes=shapes, residuals=res, ok=ok,
    )


def modal_analysis(
    problem: TrussProblem,
    n_modes: int = 6,
    lumped: bool = True,
    data=None,
    n_iter: int = 25,
    cg_tol: float = 1e-8,
    seed: int = 0,
    prestress_u=None,
    host: Optional[bool] = None,
    mesh=None,
) -> ModalResult:
    """Lowest natural frequencies and mode shapes.

    Host (numpy/LAPACK float64) dense path below DENSE_DOF_LIMIT — zero
    device programs, so a cold process answers in milliseconds instead of
    paying remote TPU compiles (_host_modal); banded inverse subspace
    iteration on device above it (lumped mass only there).  `host=False`
    forces the on-device dense path (e.g. to stay on a TPU-resident data
    pipeline); `prestress_u` adds the initial-stress stiffness of a
    static state (see modal_eigenpairs); `mesh` distributes the banded
    path's block solves over the mesh's "tp" row blocks
    (_subspace_iteration — multi-chip eigensolves for meshes past one
    device's HBM).
    """
    from .newton import DENSE_DOF_LIMIT, _dia_layout_of

    if host is None:
        host = problem.ndof <= DENSE_DOF_LIMIT
    if host:
        if problem.ndof > DENSE_DOF_LIMIT:
            raise ValueError("host modal analysis is dense-only; use the "
                             "banded device path for large meshes")
        free_idx, _ = problem.free_fixed()
        if n_modes > free_idx.size:
            raise ValueError("n_modes exceeds the number of free DOFs")
        pu = (None if prestress_u is None
              else np.asarray(jax.device_get(prestress_u)))
        return _host_modal(problem, n_modes, lumped, pu)

    data = data if data is not None else problem.to_device()
    dtype = data.loads.dtype
    free_idx, _ = problem.free_fixed()
    if n_modes > free_idx.size:
        raise ValueError("n_modes exceeds the number of free DOFs")

    n_e = None
    if prestress_u is not None:
        from ..ops.geometric import element_axial_forces

        n_e = element_axial_forces(data, problem.material,
                                   jnp.asarray(prestress_u, dtype))

    if problem.ndof <= DENSE_DOF_LIMIT:
        k = assemble_system(data, problem.material,
                            jnp.zeros(problem.ndof, dtype))[0]
        if n_e is not None:
            from ..ops.geometric import assemble_geometric

            k = k + assemble_geometric(data, n_e)
        k_ff = k[np.ix_(free_idx, free_idx)]
        if lumped:
            m_free = lumped_mass(data, problem.material)[
                jnp.asarray(free_idx)]
            w, v_free = _dense_eigensolve(k_ff, m_free, n_modes, True)
        else:
            m_ff = consistent_mass(data, problem.material)[
                np.ix_(free_idx, free_idx)]
            w, v_free = _dense_eigensolve(k_ff, m_ff, n_modes, False)
        shapes = jnp.zeros((problem.ndof, n_modes), dtype).at[
            jnp.asarray(free_idx)].set(v_free)
    else:
        if not lumped:
            raise ValueError("large-mesh modal analysis requires lumped mass")
        layout = _dia_layout_of(problem, data)
        if layout is None:
            raise ValueError("large-mesh modal analysis requires a banded "
                             "(DIA) operator; renumber the mesh")
        from ..ops.cg import stiffness_coefficients
        from ..ops.dia import assemble_dia
        from ..ops.mg import mask_dia

        s = stiffness_coefficients(data, problem.material, 1.0)
        kd = assemble_dia(layout, s, data.gvec)
        if n_e is not None:
            from ..ops.geometric import assemble_geometric_dia

            kd = kd + assemble_geometric_dia(layout, data, n_e)
        kd = mask_dia(tuple(int(o) for o in layout.offsets), kd,
                      data.free_mask)
        m_diag = lumped_mass(data, problem.material) * data.free_mask \
            + (1.0 - data.free_mask)
        w, shapes, ritz_change = _subspace_iteration(
            layout, kd, m_diag, data.free_mask, n_modes, n_iter, cg_tol,
            seed, mesh=mesh)

    # Residual check ||K v - lam M v|| / (lam ||M v||).
    k_full = None
    if problem.ndof <= DENSE_DOF_LIMIT:
        k_full = k  # includes the prestress term when requested

        def kv(v):
            return (k_full @ v) * data.free_mask
    else:
        from ..ops.dia import dia_matvec

        def kv(v):
            return dia_matvec(layout, kd, v) * data.free_mask

    m_vec = lumped_mass(data, problem.material) if lumped else None
    res = []
    for j in range(n_modes):
        v = shapes[:, j]
        mv = (m_vec * v if lumped
              else consistent_mass(data, problem.material) @ v)
        mv = mv * data.free_mask
        num = jnp.linalg.norm(kv(v) - w[j] * mv)
        den = jnp.maximum(jnp.abs(w[j]) * jnp.linalg.norm(mv), 1e-30)
        res.append(num / den)

    # Gershgorin estimate of ||K||_inf: the float32 FLOOR of the Kv-based
    # relative residual for mode j is ~eps32 ||K|| / lambda_j (computing
    # K v cancels log10(||K||/lambda) digits).  Residuals at that floor
    # mean "resolved as well as float32 allows", not "wrong" — the
    # Rayleigh-Ritz values themselves come from Y^T(MX) (no
    # cancellation, see _subspace_iteration) and stay accurate well
    # below the floor.
    if k_full is not None:
        row_max = float(jnp.max(jnp.sum(jnp.abs(k_full), axis=1)))
    else:
        row_max = float(jnp.max(jnp.sum(jnp.abs(kd), axis=0)))

    w, shapes, res = jax.device_get((w, shapes, jnp.stack(res)))
    res_np = np.asarray(res)
    w_np = np.abs(np.asarray(w))
    floor = (1.2e-7 * row_max * np.sqrt(problem.ndof)
             / np.maximum(w_np, 1e-30))
    within_floor = res_np < np.maximum(1e-2, 10.0 * floor)
    if problem.ndof <= DENSE_DOF_LIMIT:
        # eigh is backward-stable: floor-level residuals are pure f32
        # noise in the CHECK, not eigenvalue error.
        ok = bool(np.all(within_floor))
    else:
        # Below the Kv floor the residual cannot distinguish accuracy
        # from garbage; require the Ritz values to have CONVERGED over
        # the final subspace iteration as well.
        rc = np.asarray(jax.device_get(ritz_change))
        ok = bool(np.all(within_floor) and np.all(rc < 1e-3))
    if not ok:
        import logging

        logging.getLogger("pinn_fem_tpu").warning(
            "modal_analysis: unresolved modes (residuals %s vs float32 "
            "floor %s%s) — ModalResult.ok=False",
            res_np, floor,
            "" if problem.ndof <= DENSE_DOF_LIMIT else
            f", ritz change {np.asarray(jax.device_get(ritz_change))}")
    w = np.asarray(w)
    # Clamp only float noise; a GENUINELY negative eigenvalue (a
    # prestressed state past the buckling point) must stay visible in
    # `eigenvalues` — silently reporting 0 Hz would be indistinguishable
    # from a rigid-body mode, and the residuals correspond to the true w.
    noise = 1e-6 * max(float(np.max(np.abs(w))), 1e-30)
    w = np.where((w < 0) & (w > -noise), 0.0, w)
    omegas = np.sqrt(np.maximum(w, 0.0))
    return ModalResult(
        eigenvalues=np.asarray(w), omegas=omegas,
        frequencies=omegas / (2.0 * np.pi),
        shapes=np.asarray(shapes), residuals=res_np, ok=ok,
    )


def rayleigh_coefficients(omega_1: float, zeta_1: float,
                          omega_2: float, zeta_2: float):
    """(alpha, beta) giving Rayleigh damping C = alpha M + beta K with the
    prescribed damping ratios at two angular frequencies.

    From zeta(w) = alpha/(2w) + beta w/2 — the standard calibration
    engineers run before every transient analysis (pick the first mode
    and the highest mode of interest).  With zeta_1 = zeta_2 = z:
    alpha = 2 z w1 w2/(w1+w2), beta = 2 z/(w1+w2)."""
    if omega_1 <= 0 or omega_2 <= 0 or omega_1 == omega_2:
        raise ValueError("need two distinct positive frequencies")
    a = np.array([[1.0 / (2.0 * omega_1), omega_1 / 2.0],
                  [1.0 / (2.0 * omega_2), omega_2 / 2.0]])
    alpha, beta = np.linalg.solve(a, np.array([zeta_1, zeta_2]))
    return float(alpha), float(beta)


def mac(phi_a: np.ndarray, phi_b: np.ndarray) -> np.ndarray:
    """Modal Assurance Criterion matrix between two mode-shape sets.

    MAC_ij = |phi_a_i . phi_b_j|^2 / (|phi_a_i|^2 |phi_b_j|^2) in [0, 1]
    — 1 on the diagonal means the sets describe the same modes regardless
    of scaling/sign; the standard test-vs-model shape-correlation metric.
    Accepts (ndof,) vectors or (ndof, n) matrices."""
    a = np.atleast_2d(np.asarray(phi_a, dtype=float).T).T
    b = np.atleast_2d(np.asarray(phi_b, dtype=float).T).T
    num = (a.T @ b) ** 2
    den = (np.sum(a * a, axis=0)[:, None]
           * np.sum(b * b, axis=0)[None, :])
    return num / np.maximum(den, 1e-300)
