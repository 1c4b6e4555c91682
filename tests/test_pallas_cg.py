"""Fused two-kernel PCG iteration (ops/pallas/cg_kernel.py): interpreter-
mode agreement with the XLA banded PCG (ops/dia.dia_cg_solve, Jacobi).
Same recurrence, so iteration counts match exactly; solutions agree to
float32 rounding (reduction order differs).  Compiled-mode parity and
performance live in benchmarks/scaling.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental import pallas as pl

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.ops.cg import stiffness_coefficients
from pinn_fem_tpu.ops.dia import assemble_dia, dia_cg_solve, dia_layout


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import pinn_fem_tpu.ops.pallas.cg_kernel as ck

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(ck.pl, "pallas_call", patched)
    return ck


def chain_problem(n):
    nodes = np.stack([np.arange(n, dtype=float), np.zeros(n)], 1)
    elements = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loads = np.zeros(2 * n)
    loads[-2] = 1.0
    fixed = np.concatenate([[0], np.arange(1, 2 * n, 2)])  # x of node 0 + all y
    return TrussProblem(nodes, elements,
                        Material(young=2.0, area=0.5, density=1.0),
                        loads, fixed, 2)


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
    loads = np.zeros(2 * rows * cols)
    fixed = []
    for r in range(rows):
        fixed += [2 * nid(r, 0), 2 * nid(r, 0) + 1]
        loads[2 * nid(r, cols - 1)] = 1.0
    return TrussProblem(nodes=nodes, elements=np.array(elements),
                        material=Material(young=1.0, area=1.0, density=1.0),
                        loads=loads, fixed_dofs=np.array(fixed), dimension=2)


def dia_system(p):
    data = p.to_device()
    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    s = stiffness_coefficients(data, p.material, 1.0)
    diags = assemble_dia(layout, s, data.gvec)
    return data, layout, diags


def test_fused_cg_matches_xla_chain(interpret_pallas):
    ck = interpret_pallas
    p = chain_problem(777)
    data, layout, diags = dia_system(p)

    x_ref, it_ref, _ = dia_cg_solve(layout, diags, data.loads,
                                    data.free_mask, tol=1e-6, max_iter=5000)
    x, it, res = ck.fused_cg_solve(layout, diags, data.loads,
                                   data.free_mask, tol=1e-6, max_iter=5000)
    assert int(it) == int(it_ref)
    scale = float(jnp.max(jnp.abs(x_ref)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-5 * scale)
    # BCs exactly honored.
    assert float(jnp.max(jnp.abs(x * data.fixed_mask))) == 0.0


def test_fused_cg_multiblock_halo(interpret_pallas):
    """Small blocks force multi-block grids with real (and multi-row) halos:
    grid strip bandwidth > 128 -> halo_rows = 2 at rows = 4."""
    ck = interpret_pallas
    from pinn_fem_tpu.ops.pallas.dia_kernel import pack_dia_interleaved

    p = grid_problem(3, 100)
    data, layout, diags = dia_system(p)
    assert layout.bandwidth > 128  # the point of this test

    # tol must be achievable in float32 on this ill-conditioned strip: at
    # unreachable tolerances both solvers run to the breakdown floor and
    # their (equally valid) stall points differ.
    x_ref, it_ref, _ = dia_cg_solve(layout, diags, data.loads,
                                    data.free_mask, tol=1e-5, max_iter=3000)
    packed = pack_dia_interleaved(layout, diags, rows=4)
    x, it, _ = ck.fused_cg_solve(layout, diags, data.loads, data.free_mask,
                                 tol=1e-5, max_iter=3000, packed=packed)
    scale = float(jnp.max(jnp.abs(x_ref)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=0, atol=2e-5 * scale)


def test_fused_cg_warm_start(interpret_pallas):
    ck = interpret_pallas
    p = chain_problem(300)
    data, layout, diags = dia_system(p)
    x_ref, _, _ = dia_cg_solve(layout, diags, data.loads, data.free_mask,
                               tol=1e-6, max_iter=5000)
    x, it, _ = ck.fused_cg_solve(layout, diags, data.loads, data.free_mask,
                                 tol=1e-6, max_iter=5000, x0=x_ref)
    assert int(it) == 0
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))
