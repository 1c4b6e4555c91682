"""Host-tier operators (ops/host.py) pinned against the device ops, and
the host transient/harmonic paths against their device twins.

The host tier exists because remote TPU compiles cost minutes while the
small-problem analysis family costs microseconds of FLOPs (round-3
VERDICT #1); these tests guarantee it is a faithful float64 mirror of
the jnp implementations, not a second source of truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.models.fields import make_mlp_field
from pinn_fem_tpu.ops import host as H
from pinn_fem_tpu.ops.assembly import assemble_system
from pinn_fem_tpu.ops.geometric import (assemble_geometric,
                                        element_axial_forces)
from pinn_fem_tpu.ops.mass import consistent_mass, lumped_mass
from pinn_fem_tpu.solvers.dynamics import solve_transient


def tower(stories=4, young=50.0):
    nodes, elements = [], []
    for s in range(stories + 1):
        nodes += [[0.0, float(s)], [1.0, float(s)]]
    for s in range(stories):
        a, b, c, d = 2 * s, 2 * s + 1, 2 * s + 2, 2 * s + 3
        elements += [[a, c], [b, d], [c, d], [a, d], [b, c]]
    nodes = np.array(nodes)
    loads = np.zeros(2 * len(nodes))
    loads[-1] = -1.0
    loads[-2] = 0.3
    return TrussProblem(nodes, np.array(elements),
                        Material(young=young, area=0.7, density=2.0),
                        loads, np.array([0, 1, 2, 3]), 2)


def mlp_tower():
    p = tower()
    mat = Material(
        young=make_mlp_field(jax.random.PRNGKey(3), hidden_layers=2,
                             neurons_per_layer=6, input_dim=3, scale=40.0),
        area=0.7,
        density=make_mlp_field(jax.random.PRNGKey(7), hidden_layers=1,
                               neurons_per_layer=5, input_dim=1, scale=2.0),
    )
    return TrussProblem(p.nodes, p.elements, mat, p.loads, p.fixed_dofs, 2)


@pytest.mark.parametrize("make", [tower, mlp_tower])
def test_host_operators_match_device(make):
    """K, lumped/consistent M, N_e and K_g agree with the jnp ops to
    float32 accuracy — including MLP material fields evaluated on host."""
    p = make()
    data = p.to_device()
    zeros = jnp.zeros(p.ndof, data.loads.dtype)
    k_dev = np.asarray(jax.device_get(
        assemble_system(data, p.material, zeros)[0]))
    np.testing.assert_allclose(H.host_stiffness(p), k_dev,
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        H.host_lumped_mass(p),
        np.asarray(jax.device_get(lumped_mass(data, p.material))),
        rtol=2e-5)
    np.testing.assert_allclose(
        H.host_consistent_mass(p),
        np.asarray(jax.device_get(consistent_mass(data, p.material))),
        rtol=2e-5, atol=1e-7)
    u = np.sin(np.arange(p.ndof))
    n_dev = np.asarray(jax.device_get(element_axial_forces(
        data, p.material, jnp.asarray(u, data.loads.dtype))))
    n_host = H.host_axial_forces(p, u)
    np.testing.assert_allclose(n_host, n_dev, rtol=2e-4, atol=1e-5)
    kg_dev = np.asarray(jax.device_get(assemble_geometric(
        data, jnp.asarray(n_host, data.loads.dtype))))
    np.testing.assert_allclose(H.host_geometric_stiffness(p, n_host),
                               kg_dev, rtol=2e-4, atol=1e-5)


def test_host_static_solve_matches_newton():
    from pinn_fem_tpu import SolverConfig, solve_nr

    p = tower()
    u_host = H.host_static_solve(p)
    res = solve_nr(p, SolverConfig(max_iterations=20, tolerance=1e-10), 1.0)
    np.testing.assert_allclose(
        u_host, np.asarray(res.displacements).reshape(-1),
        rtol=1e-4, atol=1e-6)
    # Fixed DOFs stay zero.
    assert np.all(u_host[p.fixed_dofs] == 0.0)


@pytest.mark.parametrize("method", ["central", "newmark", "modal"])
def test_host_transient_matches_device(method):
    """host=True integration mirrors the device recurrences (f64 vs f32
    is the only difference)."""
    from pinn_fem_tpu.solvers.dynamics import stable_dt

    p = tower()
    # Pinned dt: the f32-vs-f64 drift below is dt-sensitive in a
    # non-monotone way — deriving dt from stable_dt would re-calibrate
    # the test every time the bound tightens (it tightened to free rows
    # in the payload round).  stable_dt itself is covered by
    # test_dynamics / test_point_mass.
    dt = 0.0633
    assert dt < stable_dt(p, damping=(0.1, 0.002))   # still stable
    kw = dict(n_steps=400, record_every=40, damping=(0.1, 0.002),
              probe_dofs=np.array([p.ndof - 2, p.ndof - 1]))
    a = solve_transient(p, dt, method=method, host=True, n_modes=8, **kw)
    b = solve_transient(p, dt, method=method, host=False, n_modes=8, **kw)
    # Newmark runs an implicit f32 solve per step; its accumulated
    # rounding shifts at the 1e-3 level whenever XLA refuses an old
    # fusion (measured: adding the no-op payload term moved it 2.5e-3).
    # The explicit/modal recurrences are pointwise and stay 10x tighter.
    d_tol = 5e-3 if method == "newmark" else 2e-4
    scale = max(np.abs(b.displacements).max(), 1e-12)
    np.testing.assert_allclose(a.displacements, b.displacements,
                               atol=d_tol * scale)
    np.testing.assert_allclose(a.velocities, b.velocities,
                               atol=5.0 * d_tol
                               * max(np.abs(b.velocities).max(), 1e-12))
    np.testing.assert_allclose(a.u_final, b.u_final, atol=d_tol * scale)
    e_a = a.kinetic_energy + a.strain_energy
    e_b = b.kinetic_energy + b.strain_energy
    np.testing.assert_allclose(e_a, e_b, atol=1e-10,
                               rtol=2e-2 if method == "newmark" else 5e-3)


def test_host_transient_prestressed_newmark_matches_central():
    """Prestressed IMPLICIT host transient (K_g in the effective
    operator) agrees with the explicit host integrator."""
    from tests.test_dynamics import _taut_chain

    p, up = _taut_chain(n_nodes=11)
    loads = np.zeros(22)
    loads[11] = 1.0
    p = TrussProblem(p.nodes, p.elements, p.material, loads,
                     p.fixed_dofs, 2)
    kw = dict(n_steps=1500, record_every=150, damping=(0.05, 0.0),
              probe_dofs=np.array([11]), prestress_u=up)
    rc = solve_transient(p, 0.01, method="central", host=True, **kw)
    rn = solve_transient(p, 0.01, method="newmark", host=True, **kw)
    scale = np.abs(rc.displacements).max()
    np.testing.assert_allclose(rn.displacements, rc.displacements,
                               atol=5e-3 * scale)


def test_moving_load_host_eval_matches_device():
    from pinn_fem_tpu.solvers.dynamics import moving_load_force_fn

    p = tower(stories=3)
    f_fn = moving_load_force_fn(p, path_nodes=[0, 2, 4, 6], speed=0.7,
                                magnitude=-2.0, dt=0.31, component=1)
    for i in (0, 1, 3, 7, 12, 40):
        dev = np.asarray(jax.device_get(f_fn(i)))
        np.testing.assert_allclose(f_fn.host_eval(i), dev,
                                   rtol=1e-5, atol=1e-6)


def test_host_mlp_field_eval_matches_device():
    """Direct pin of the numpy MLP forward against eval_batch (softplus,
    scale, input adaptation)."""
    for input_dim in (1, 3, 5):
        f = make_mlp_field(jax.random.PRNGKey(11), hidden_layers=2,
                           neurons_per_layer=7, input_dim=input_dim,
                           scale=3.0)
        x = np.linspace(-1, 1, 12).reshape(4, 3)
        dev = np.asarray(jax.device_get(
            f.eval_batch(jnp.asarray(x, jnp.float32))))
        np.testing.assert_allclose(H.eval_field_host(f, x), dev,
                                   rtol=1e-5, atol=1e-6)


def test_host_nonlinear_system_matches_device():
    """Green-Lagrange tangent + internal force mirror
    (assemble_system_nonlinear), at small and LARGE displacements."""
    from pinn_fem_tpu.ops.assembly import assemble_system_nonlinear

    p = tower()
    data = p.to_device()
    for scale in (1e-4, 0.3):
        u = scale * np.sin(np.arange(p.ndof))
        kt_d, fi_d, _ = jax.device_get(assemble_system_nonlinear(
            data, p.material, jnp.asarray(u, data.loads.dtype)))
        kt_h, fi_h = H.host_nonlinear_system(p, u)
        np.testing.assert_allclose(kt_h, np.asarray(kt_d),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(fi_h, np.asarray(fi_d),
                                   rtol=2e-4, atol=1e-5)


def test_riks_host_matches_device_path():
    """The host-tier arc-length continuation traces the same von Mises
    snap-through path as the device tier."""
    from pinn_fem_tpu.solvers.riks import solve_riks
    from tests.test_transient_batched import shallow_arch

    p = shallow_arch(young=50.0, rise=0.3)
    kw = dict(n_steps=60, initial_dlambda=0.02,
              stop_fn=lambda u, lam: u[3] < -0.7)
    a = solve_riks(p, host=True, **kw)
    b = solve_riks(p, host=False, **kw)
    assert a.converged and b.converged
    n = min(a.load_factors.size, b.load_factors.size)
    scale = np.abs(b.load_factors[:n]).max()
    np.testing.assert_allclose(a.load_factors[:n], b.load_factors[:n],
                               atol=2e-3 * scale)
    np.testing.assert_allclose(a.displacements[:n, 3],
                               b.displacements[:n, 3], atol=5e-3)
