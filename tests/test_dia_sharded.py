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
