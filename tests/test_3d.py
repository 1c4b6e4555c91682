"""3D truss support — an extension beyond the reference (whose FEMModel
validates dimension in {1, 2}, reference model.py:53-77).  The whole stack
is dimension-generic (ke = s g g^T with a length-2*dim g vector), so these
tests drive 3D through every tier: element kernels, assembly, NR/GD/fused
solvers, the banded DIA path, the JSON schema (dict nodes with z /
fixed_z / measured_uz) and the CLI."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve
from pinn_fem_tpu.solvers.gd import solve_gd
from pinn_fem_tpu.solvers.newton import solve_nr

REPO = Path(__file__).resolve().parent.parent


def chain3d(n=5):
    """Axial chain along x embedded in 3D, y/z pinned: analytic u_x = x."""
    nodes = np.stack([np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], 1)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(3 * n)
    loads[3 * (n - 1)] = 1.0
    fixed = sorted({0} | set(range(1, 3 * n, 3)) | set(range(2, 3 * n, 3)))
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=1.0, density=1.0),
                        loads, np.array(fixed), 3)


def tripod():
    """Three bars from a fixed equilateral base to an apex at (0,0,1).

    Each bar has L = sqrt(2) and direction cosine 1/sqrt(2) with z, so the
    apex z-stiffness is 3 * (EA/L) * cz^2 = 3/(2 sqrt 2) and a unit
    downward load gives uz = -2 sqrt(2) / 3 (lateral components cancel by
    symmetry)."""
    base = np.array([[1.0, 0.0, 0.0],
                     [-0.5, np.sqrt(3) / 2, 0.0],
                     [-0.5, -np.sqrt(3) / 2, 0.0]])
    nodes = np.vstack([base, [[0.0, 0.0, 1.0]]])
    elements = np.array([[0, 3], [1, 3], [2, 3]])
    loads = np.zeros(12)
    loads[11] = -1.0
    return TrussProblem(nodes, elements,
                        Material(young=1.0, area=1.0, density=1.0),
                        loads, np.arange(9), 3)


UZ_TRIPOD = -2.0 * np.sqrt(2.0) / 3.0


def test_element_kernel_3d_closed_form():
    """Diagonal 3D bar: ke = (EA/L) g g^T with g = [-c, c], c = dx/L."""
    from pinn_fem_tpu.ops.elements import truss_linear_batch

    dx = np.array([1.0, 2.0, 2.0])  # L = 3
    c = dx / 3.0
    g = np.concatenate([-c, c])[None, :]
    u_e = np.array([[0.1, -0.2, 0.3, 0.4, 0.0, -0.1]])
    out = truss_linear_batch(jnp.asarray(g, jnp.float32),
                             jnp.array([1.0 / 3.0], jnp.float32),
                             jnp.asarray(u_e, jnp.float32),
                             jnp.array([6.0], jnp.float32),
                             jnp.array([0.5], jnp.float32))
    ke_expect = (6.0 * 0.5 / 3.0) * np.outer(g[0], g[0])
    np.testing.assert_allclose(np.asarray(out.ke[0]), ke_expect, atol=1e-6)
    gu = float(g[0] @ u_e[0])
    np.testing.assert_allclose(float(out.strain[0]), gu / 3.0, rtol=1e-6)


def test_nr_chain3d_analytic():
    r = solve_nr(chain3d(), SolverConfig(), 1.0)
    assert r.converged
    np.testing.assert_allclose(r.displacements[:, 0], np.arange(5.0),
                               atol=1e-5)
    assert float(np.abs(r.displacements[:, 1:]).max()) == 0.0


def test_nr_tripod_closed_form():
    r = solve_nr(tripod(), SolverConfig(), 1.0)
    assert r.converged
    apex = r.displacements[3]
    np.testing.assert_allclose(apex[2], UZ_TRIPOD, rtol=1e-5)
    np.testing.assert_allclose(apex[:2], 0.0, atol=1e-6)
    # Reactions balance the applied load.
    np.testing.assert_allclose(r.reactions[:, 2].sum(), 1.0, rtol=1e-5)


def test_gd_matches_nr_3d():
    p = tripod()
    cfg = SolverConfig(method="gd", learning_rate_u=0.05,
                       max_iterations=5000, tolerance=1e-8)
    r = solve_gd(p, cfg, None, None, target_load_factor=1.0)
    assert r.converged
    np.testing.assert_allclose(r.displacements[3, 2], UZ_TRIPOD, atol=1e-3)


def test_driver_and_fused_3d():
    """The incremental driver (and the fused on-device path it may select)
    handles dimension=3."""
    r = solve(tripod(), SolverConfig(method="nr", n_increments=3),
              verbose=False)
    assert r.converged
    np.testing.assert_allclose(r.displacements[3, 2], UZ_TRIPOD, rtol=1e-5)


def test_dia_banded_path_3d():
    """components=3 node-block aggregation + banded CG on a 3D chain."""
    p = chain3d(400)
    r = solve_nr(p, SolverConfig(tolerance=1e-6), 1.0, linear_solver="cg-dia")
    assert r.converged
    np.testing.assert_allclose(r.displacements[:, 0], np.arange(400.0),
                               rtol=1e-4, atol=2e-2)


def test_green_lagrange_3d_small_strain_matches_linear():
    from pinn_fem_tpu.ops.assembly import (assemble_system,
                                           assemble_system_nonlinear)

    p = tripod()
    data = p.to_device()
    u = jnp.zeros(p.ndof, jnp.float32).at[11].set(1e-5)
    k_lin, f_lin, _ = assemble_system(data, p.material, u)
    k_nl, f_nl, _ = assemble_system_nonlinear(data, p.material, u)
    np.testing.assert_allclose(np.asarray(k_nl), np.asarray(k_lin),
                               atol=2e-4 * float(jnp.abs(k_lin).max()))
    np.testing.assert_allclose(np.asarray(f_nl), np.asarray(f_lin),
                               atol=2e-4 * float(jnp.abs(f_lin).max()) + 1e-9)


def test_native_geometry_3d_matches_numpy():
    from pinn_fem_tpu.utils import native as native_mod

    if not native_mod.available():
        pytest.skip("native library not built")
    p = tripod()
    d_np = p.to_device(use_native=False)
    d_cc = p.to_device(use_native=True)
    np.testing.assert_allclose(np.asarray(d_cc.gvec), np.asarray(d_np.gvec),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_cc.dof_map),
                                  np.asarray(d_np.dof_map))
    np.testing.assert_allclose(np.asarray(d_cc.mid), np.asarray(d_np.mid),
                               rtol=1e-6)


def test_schema_3d_dict_nodes():
    from pinn_fem_tpu.io.schema import parse_problem_dict

    data = {
        "nodes": [
            {"x": 0.0, "y": 0.0, "z": 0.0, "fixed": True},
            {"x": 1.0, "y": 0.0, "z": 0.0, "fixed_y": True, "fixed_z": True,
             "measured_ux": 0.5},
            {"x": 1.0, "y": 0.0, "z": 1.0, "measured_uz": -0.25},
        ],
        "elements": [[0, 1], [1, 2]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * 9,
        "solver_type": "pinn-gd",
    }
    parsed = parse_problem_dict(data)
    p = parsed.problem
    assert p.dimension == 3 and p.ndof == 9
    np.testing.assert_array_equal(np.sort(p.fixed_dofs), [0, 1, 2, 4, 5])
    np.testing.assert_array_equal(parsed.measured_dofs, [3, 8])
    np.testing.assert_allclose(parsed.measured_disp, [0.5, -0.25])


def test_schema_3d_coord_lists():
    from pinn_fem_tpu.io.schema import parse_problem_dict

    data = {
        "nodes": [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]],
        "elements": [[0, 1]],
        "material": {"young": 1.0, "area": 1.0, "density": 1.0},
        "loads": [0.0] * 6,
        "fixed_dofs": [0, 1, 2],
        "solver_type": "fem",
    }
    parsed = parse_problem_dict(data)
    assert parsed.problem.dimension == 3
    assert parsed.problem.nodes.shape == (2, 3)


def test_cli_3d_end_to_end(tmp_path):
    """The reference-contract CLI solves the 3D tripod JSON and the result
    matches the closed form."""
    src = REPO / "examples" / "json" / "truss3d.json"
    dst = tmp_path / "truss3d.json"
    dst.write_text(src.read_text())
    proc = subprocess.run(
        [sys.executable, "-m", "pinn_fem_tpu.cli.generic", str(dst)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr
    res = json.loads((tmp_path / "truss3d.res.json").read_text())
    assert res["success"] and res["converged"]
    # The result contract carries the FLAT displacement vector (reference
    # generic.py:476-495): apex uz is global DOF 11.
    np.testing.assert_allclose(res["displacements"][11], UZ_TRIPOD,
                               rtol=1e-4)


def test_pinn_identifies_young_3d():
    """Inverse identification in 3D: an MLP young-field (input_dim=4 —
    load_factor, x, y, z) recovers E = 1 from measured displacements of
    the 3D chain."""
    import jax

    from pinn_fem_tpu.models.fields import make_mlp_field

    p = chain3d(4)
    material = Material(
        young=make_mlp_field(jax.random.PRNGKey(0), hidden_layers=2,
                             neurons_per_layer=8, input_dim=4, scale=1.0,
                             enforce_positive=True),
        area=1.0, density=1.0,
    )
    problem = TrussProblem(p.nodes, p.elements, material, p.loads,
                           p.fixed_dofs, 3)
    measured_dofs = np.array([3, 6, 9])       # u_x of nodes 1..3
    measured = np.array([1.0, 2.0, 3.0])
    cfg = SolverConfig(method="gd", learning_rate_u=0.02,
                       learning_rate_theta=2e-3, max_iterations=3000,
                       tolerance=1e-7, alpha_data=100.0)
    r = solve_gd(problem, cfg, measured, measured_dofs,
                 target_load_factor=1.0)
    np.testing.assert_allclose(r.displacements[:, 0], np.arange(4.0),
                               atol=5e-3)
    assert r.nn_parameters is not None
    # Identified E at element midpoints must satisfy equilibrium: E*A = 1
    # (area is scalar 1); evaluated with the 4-column (lf, x, y, z) inputs.
    from pinn_fem_tpu.models.fields import point_inputs_dict_order

    x = point_inputs_dict_order(problem.element_midpoints(), 3, 1.0)
    assert x.shape == (3, 4)
    e_vals = np.asarray(problem.material.young.eval_batch(x))
    np.testing.assert_allclose(e_vals, 1.0, atol=3e-2)
