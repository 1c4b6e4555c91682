"""Distributed row-block DIA CG (parallel/dia_sharded.py) on the 8-virtual-
device mesh: halo-exchange matvec and psum-reduced PCG must reproduce the
single-device banded solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.ops.cg import stiffness_coefficients
from pinn_fem_tpu.ops.dia import assemble_dia, dia_cg_solve, dia_layout, dia_matvec
from pinn_fem_tpu.parallel.dia_sharded import dia_cg_solve_sharded


def tp_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(1, n), ("dp", "tp"))


def chain(n_nodes):
    nodes = np.stack([np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], 1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(2 * n_nodes)
    loads[-2] = 1.0
    fixed = [0] + [2 * i + 1 for i in range(n_nodes)]
    return TrussProblem(nodes=nodes, elements=elements,
                        material=Material(young=1.0, area=1.0, density=1.0),
                        loads=loads, fixed_dofs=np.array(fixed), dimension=2)


def banded_system(p):
    data = p.to_device()
    s = stiffness_coefficients(data, p.material, 1.0)
    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    diags = assemble_dia(layout, s, data.gvec)
    return data, layout, diags


def test_sharded_cg_matches_single_device():
    p = chain(257)  # 514 DOFs over 8 shards (ndof not divisible: padding)
    data, layout, diags = banded_system(p)
    rhs = jnp.asarray(data.loads)

    x1, it1, rel1 = dia_cg_solve(layout, diags, rhs, data.free_mask,
                                 tol=1e-6, max_iter=20000)
    x8, it8, rel8 = dia_cg_solve_sharded(layout, diags, rhs, data.free_mask,
                                         tp_mesh(8), tol=1e-6, max_iter=20000)
    # Same solution; iteration counts agree closely (different reduction
    # orders shift float32 rounding, so allow a small delta).
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1),
                               atol=2e-3, rtol=1e-3)
    assert abs(int(it8) - int(it1)) <= max(3, int(it1) // 20), (int(it1), int(it8))
    # True residual of the sharded solution on the unsharded operator.
    r = (np.asarray(dia_matvec(layout, diags, x8)) - np.asarray(rhs))
    r *= np.asarray(data.free_mask)
    assert np.linalg.norm(r) <= 1e-4


def test_sharded_cg_exact_solution():
    p = chain(129)
    data, layout, diags = banded_system(p)
    x, it, rel = dia_cg_solve_sharded(layout, diags, jnp.asarray(data.loads),
                                      data.free_mask, tp_mesh(8),
                                      tol=1e-7, max_iter=20000)
    ux = np.asarray(x)[0::2]
    np.testing.assert_allclose(ux, np.arange(129), atol=2e-3)


def test_bandwidth_exceeding_shard_raises():
    p = chain(5)  # 10 DOFs over 8 shards -> 2-row shards < bandwidth 3
    data, layout, diags = banded_system(p)
    with pytest.raises(ValueError, match="exceeds"):
        dia_cg_solve_sharded(layout, diags, jnp.asarray(data.loads),
                             data.free_mask, tp_mesh(8))


def test_sharded_transient_matches_single_device():
    """The whole-history shard_map integrator (halo-exchange matvec per
    step, psum probes/energies) reproduces the single-device explicit
    integrator, including damped and stiffness-damped runs."""
    from pinn_fem_tpu.parallel.dia_sharded import solve_transient_sharded
    from pinn_fem_tpu.solvers.dynamics import solve_transient, stable_dt

    p = chain(257)
    dt = 0.5 * stable_dt(p)
    probe = np.array([2 * 256, 2 * 128])  # tip + middle x DOFs
    for damping in [(0.0, 0.0), (0.5, 0.01)]:
        ref = solve_transient(p, dt=dt, n_steps=400, damping=damping,
                              method="central", record_every=40,
                              probe_dofs=probe)
        sh = solve_transient_sharded(p, dt, 400, tp_mesh(8),
                                     damping=damping, record_every=40,
                                     probe_dofs=probe)
        scale = np.abs(ref.displacements).max()
        np.testing.assert_allclose(sh.displacements, ref.displacements,
                                   atol=1e-4 * scale)
        np.testing.assert_allclose(sh.u_final, ref.u_final,
                                   atol=1e-4 * scale)
        np.testing.assert_allclose(sh.kinetic_energy, ref.kinetic_energy,
                                   rtol=1e-3, atol=1e-10)
        np.testing.assert_allclose(sh.strain_energy, ref.strain_energy,
                                   rtol=1e-3, atol=1e-10)


def test_sharded_modal_matches_unsharded():
    """Multi-chip eigensolves: modal_analysis(mesh=...) distributes the
    subspace block solves over the tp row blocks; spectrum equals the
    single-device banded path."""
    import pinn_fem_tpu.solvers.newton as newton
    from pinn_fem_tpu.solvers.modal import modal_analysis
    from tests.test_modal import fixed_fixed_chain

    p = fixed_fixed_chain(n_elm=120)
    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        plain = modal_analysis(p, n_modes=3, n_iter=25)
        p2 = fixed_fixed_chain(n_elm=120)
        shard = modal_analysis(p2, n_modes=3, n_iter=25, mesh=tp_mesh())
    finally:
        newton.DENSE_DOF_LIMIT = orig
    np.testing.assert_allclose(shard.eigenvalues, plain.eigenvalues,
                               rtol=1e-3)
    assert shard.ok


def test_sharded_buckling_matches_unsharded():
    """buckling_analysis(mesh=...): sharded base solve + subspace block
    solves; critical factor equals the single-device banded path."""
    import pinn_fem_tpu.solvers.newton as newton
    from pinn_fem_tpu.solvers.buckling import buckling_analysis
    from tests.test_buckling import braced_tower

    orig = newton.DENSE_DOF_LIMIT
    try:
        newton.DENSE_DOF_LIMIT = 16
        plain = buckling_analysis(braced_tower(stories=12), n_modes=1,
                                  n_iter=40)
        shard = buckling_analysis(braced_tower(stories=12), n_modes=1,
                                  n_iter=40, mesh=tp_mesh(4))
    finally:
        newton.DENSE_DOF_LIMIT = orig
    np.testing.assert_allclose(shard.load_factors[0],
                               plain.load_factors[0], rtol=2e-3)
    np.testing.assert_allclose(shard.axial_forces, plain.axial_forces,
                               rtol=1e-3, atol=1e-6)


def test_sharded_block_cg_matches_per_column():
    """dia_cg_solve_sharded_block: k right-hand sides in one sharded
    program equal k independent single-device solves (different
    convergence speeds per column exercise the freeze mask)."""
    from pinn_fem_tpu.parallel.dia_sharded import dia_cg_solve_sharded_block

    p = chain(257)
    data, layout, diags = banded_system(p)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((p.ndof, 5)), jnp.float32) \
        * data.free_mask[:, None]
    # Column 0: the real load vector (converges fast on the chain).
    b = b.at[:, 0].set(jnp.asarray(data.loads))

    xb, it, rel = dia_cg_solve_sharded_block(
        layout, diags, b, data.free_mask, tp_mesh(), tol=1e-7)
    assert np.all(np.asarray(jax.device_get(rel)) < 1e-6)
    mask = np.asarray(data.free_mask)
    for j in range(5):
        xj = dia_cg_solve(layout, diags, b[:, j], data.free_mask,
                          tol=1e-7, use_pallas=False)[0]
        # Forward error of f32 CG at kappa ~ n^2 dwarfs the residual tol
        # (same bound as test_sharded_cg_matches_single_device), and the
        # TRUE residual of recursive-residual CG floors at eps32*kappa
        # regardless of the reported tol — so gate the block solver
        # against the single-device solver's OWN true residual, not an
        # absolute number.
        np.testing.assert_allclose(np.asarray(xb[:, j]), np.asarray(xj),
                                   rtol=1e-2, atol=2e-3)

        def true_res(x):
            r = (np.asarray(dia_matvec(layout, diags, x))
                 - np.asarray(b[:, j])) * mask
            return np.linalg.norm(r)

        assert true_res(xb[:, j]) <= 3.0 * true_res(xj) + 1e-6


def test_sharded_plane_banded_matches_single_device():
    """solve_plane_static_banded(mesh=...) rides the row-block-sharded
    CG (round-4 VERDICT #4a) and must equal the single-device banded
    tier to f32 drift."""
    from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                           rect_mesh,
                                           solve_plane_static_banded)

    nodes, elems = rect_mesh(1.0, 4.0, 8, 48, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == 1.0)
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [10.0, 0.0], 0.1)
    p = PlaneProblem(nodes=nodes, elements=elems, young=1000.0,
                     poisson=0.3, thickness=0.1, density=1.0,
                     loads=loads,
                     fixed_dofs=np.concatenate([2 * left,
                                                2 * bottom + 1]))
    r1, _, _ = solve_plane_static_banded(p, tol=1e-7)
    rn, iters, rel = solve_plane_static_banded(p, tol=1e-7,
                                               mesh=tp_mesh(4))
    assert rel < 1e-6 and iters > 0
    scale = np.abs(r1.displacements).max()
    np.testing.assert_allclose(rn.displacements / scale,
                               r1.displacements / scale, atol=1e-5)
    np.testing.assert_allclose(rn.von_mises, r1.von_mises,
                               rtol=1e-3, atol=1e-5)


def test_sharded_frame_banded_matches_single_device():
    """solve_frame_static_banded(mesh=...): 6-DOF bending blocks
    through the same sharded banded pipeline == single-device."""
    from pinn_fem_tpu.models.frame import (FrameProblem,
                                           solve_frame_static_banded)

    n = 24
    nodes = np.array([[0.0, 3.0 * i] for i in range(n)])
    elems = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(3 * n)
    loads[3 * (n - 1)] = 1000.0
    p = FrameProblem(nodes=nodes, elements=elems, young=200e9,
                     area=0.01, inertia=1e-4, density=7850.0,
                     loads=loads, fixed_dofs=np.array([0, 1, 2]))
    r1, _, _ = solve_frame_static_banded(p, tol=1e-8)
    rn, _, rel = solve_frame_static_banded(p, tol=1e-8,
                                           mesh=tp_mesh(4))
    assert rel < 1e-7
    # Bending-dominated cantilever: f32 CG at rel 1e-8 still leaves
    # conditioning-amplified solution differences between iteration
    # paths (~4e-4 measured) — same tolerance as banded-vs-dense.
    scale = np.abs(r1.displacements).max()
    np.testing.assert_allclose(rn.displacements / scale,
                               r1.displacements / scale, atol=1e-3)
    # Transverse tip load on a vertical column: axial forces are ~0,
    # so compare on the moment scale (nonzero), not a 0/0 ratio.
    m_scale = np.abs(r1.moments).max()
    assert m_scale > 0.0
    np.testing.assert_allclose(rn.moments / m_scale,
                               r1.moments / m_scale, atol=1e-3)
    np.testing.assert_allclose(rn.axial / m_scale * 3.0,
                               r1.axial / m_scale * 3.0, atol=1e-3)


def test_sharded_monte_carlo_pf_matches_single_device():
    """dp-sharded Monte-Carlo reliability (round-4 VERDICT #4b): the
    sample axis shards over "dp" and the estimate is EXACTLY the
    single-device one (same rng stream; zero-weight padding rows)."""
    from pinn_fem_tpu.solvers.reliability import form_reliability

    p = TrussProblem(
        nodes=np.array([[0.0, 0.0], [1.0, 0.0]]),
        elements=np.array([[0, 1]]),
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=np.array([0.0, 0.0, 1.0, 0.0]),
        fixed_dofs=np.array([0, 1, 3]), dimension=2)
    kw = dict(
        variables=[
            {"name": "S", "kind": "load_scale",
             "distribution": "normal", "mean": 1.0, "std": 0.2},
            {"name": "R", "kind": "resistance",
             "distribution": "normal", "mean": 1.6, "std": 0.1},
        ],
        limit_state={"type": "stress", "variable": "R"},
        mc_samples=4096, mc_seed=3, mc_chunk=512)
    r1 = form_reliability(p, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("dp", "tp"))
    rn = form_reliability(p, mesh=mesh, **kw)
    assert rn.mc_pf == r1.mc_pf
    assert rn.mc_pf > 0.0
    np.testing.assert_array_equal(rn.mc_pf_per_ls, r1.mc_pf_per_ls)
    # Sanity vs the exact closed form beta = 0.6/sqrt(0.05) = 2.683:
    # pf ~ 3.6e-3; 4096 crude samples put the estimate within ~4 sigma.
    from math import erf, sqrt
    pf_exact = 0.5 * (1.0 - erf(2.6833 / sqrt(2.0)))
    assert abs(rn.mc_pf - pf_exact) < 5.0 * r1.mc_std_error + 1e-4
