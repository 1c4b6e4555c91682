"""Banded algebraic multigrid (ops/mg.py): DIA index-algebra building
blocks verified against dense linear algebra, and the V-cycle as a PCG
preconditioner (far fewer iterations, same solution)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.ops import mg
from pinn_fem_tpu.ops.cg import stiffness_coefficients
from pinn_fem_tpu.ops.dia import assemble_dia, dia_cg_solve, dia_layout, dia_matvec

OFFSETS = (-6, -5, -1, 0, 1, 5, 6)
N = 24


def random_dia(rng, symmetric=False, spd_shift=0.0):
    d = np.zeros((len(OFFSETS), N), np.float64)
    for k, o in enumerate(OFFSETS):
        lo, hi = max(0, -o), min(N, N - o)
        d[k, lo:hi] = rng.normal(size=hi - lo)
    if symmetric:
        for k, o in enumerate(OFFSETS):
            if o > 0:
                ki = OFFSETS.index(-o)
                for i in range(N):
                    if 0 <= i + o < N:
                        d[ki, i + o] = d[k, i]
        k0 = OFFSETS.index(0)
        d[k0] = np.abs(d[k0]) + spd_shift
    return d


def dense(offs, d, n):
    a = np.zeros((n, n))
    for k, o in enumerate(offs):
        for i in range(n):
            if 0 <= i + o < n:
                a[i, i + o] += d[k, i]
    return a


def test_dia_mul_matches_dense():
    rng = np.random.default_rng(0)
    da, db = random_dia(rng), random_dia(rng)
    off, d = mg.dia_mul(OFFSETS, jnp.asarray(da), OFFSETS, jnp.asarray(db), N)
    np.testing.assert_allclose(
        dense(off, np.asarray(d), N),
        dense(OFFSETS, da, N) @ dense(OFFSETS, db, N), atol=1e-5,
    )


@pytest.mark.parametrize("components", [1, 2])
def test_coarsen_is_galerkin_triple_product(components):
    rng = np.random.default_rng(1)
    da = random_dia(rng)
    off_c, d_c, n_c = mg.coarsen(OFFSETS, jnp.asarray(da), N,
                                 components=components)
    p = np.zeros((N, n_c))
    for i in range(N):
        c, node = i % components, i // components
        p[i, components * (node // 2) + c] = 1.0
    np.testing.assert_allclose(
        dense(off_c, np.asarray(d_c), n_c),
        p.T @ dense(OFFSETS, da, N) @ p, atol=1e-5,
    )


def test_smoothed_operator_matches_dense_formula():
    rng = np.random.default_rng(2)
    ds = random_dia(rng, symmetric=True, spd_shift=5.0)
    a = dense(OFFSETS, ds, N)
    om = 2.0 / 3.0
    dinv = np.diag(1.0 / np.diag(a))
    want = (np.eye(N) - om * a @ dinv) @ a @ (np.eye(N) - om * dinv @ a)
    off_s, d_s = mg.smoothed_operator(OFFSETS, jnp.asarray(ds), N, omega=om)
    np.testing.assert_allclose(dense(off_s, np.asarray(d_s), N), want,
                               atol=1e-5)


def grid_problem(rows, cols):
    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    nodes = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(float)
    nid = lambda r, c: r * cols + c
    elements = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                elements.append([nid(r, c), nid(r, c + 1)])
            if r + 1 < rows:
                elements.append([nid(r, c), nid(r + 1, c)])
            if c + 1 < cols and r + 1 < rows:
                elements.append([nid(r, c), nid(r + 1, c + 1)])
                elements.append([nid(r, c + 1), nid(r + 1, c)])
    nnode = rows * cols
    loads = np.zeros(2 * nnode)
    fixed = []
    for r in range(rows):
        fixed += [2 * nid(r, 0), 2 * nid(r, 0) + 1]
        loads[2 * nid(r, cols - 1)] = 1.0
    return TrussProblem(
        nodes=nodes, elements=np.array(elements),
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array(fixed), dimension=2,
    )


def test_mg_pcg_matches_jacobi_with_far_fewer_iterations():
    p = grid_problem(20, 40)  # 1.6k DOFs, 2 smoothed coarsenings
    data = p.to_device()
    s = stiffness_coefficients(data, p.material, 1.0)
    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    diags = assemble_dia(layout, s, data.gvec)
    rhs = jnp.asarray(data.loads)

    x_j, it_j, _ = dia_cg_solve(layout, diags, rhs, data.free_mask,
                                tol=1e-6, max_iter=20000, precond="jacobi",
                                components=2)
    x_m, it_m, _ = dia_cg_solve(layout, diags, rhs, data.free_mask,
                                tol=1e-6, max_iter=20000, precond="mg",
                                components=2)
    # Same solution (both converge the same masked system).
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j),
                               atol=2e-3, rtol=1e-3)
    # True residual small for the MG solution.
    r = np.asarray(dia_matvec(layout, diags, x_m)) - np.asarray(rhs)
    r *= np.asarray(data.free_mask)
    assert np.linalg.norm(r) <= 1e-3
    # The point of the exercise: an order of magnitude fewer iterations.
    assert int(it_m) * 8 < int(it_j), (int(it_m), int(it_j))


def test_mg_preconditioned_newton_solve():
    """Full NR solve through the cg-dia path with the MG preconditioner."""
    from pinn_fem_tpu import SolverConfig
    from pinn_fem_tpu.solvers.newton import solve_nr

    p = grid_problem(16, 32)
    r = solve_nr(p, SolverConfig(max_iterations=20, tolerance=1e-5), 1.0,
                 linear_solver="cg-dia", cg_precond="mg")
    assert r.converged
    p2 = grid_problem(16, 32)
    r2 = solve_nr(p2, SolverConfig(max_iterations=20, tolerance=1e-5), 1.0,
                  linear_solver="cg-dia", cg_precond="jacobi")
    np.testing.assert_allclose(r.displacements, r2.displacements,
                               atol=5e-3, rtol=1e-3)
