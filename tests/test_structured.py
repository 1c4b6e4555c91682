"""Structured-grid slice gather/scatter (ops/structured.py): detection
strictness and exact equivalence with the general random-index forms."""

import numpy as np

from pinn_fem_tpu.models.plane import rect_mesh
from pinn_fem_tpu.models.solid import box_mesh
from pinn_fem_tpu.ops.structured import (box_grid_of,
                                         make_plane_grid_ops,
                                         make_solid_grid_ops,
                                         rect_grid_of)


def test_rect_detection():
    nodes, elems = rect_mesh(3.0, 2.0, 5, 3, "quad")
    assert rect_grid_of(elems, nodes.shape[0]) == (5, 3)
    # permuted element order: not canonical
    assert rect_grid_of(elems[::-1], nodes.shape[0]) is None
    # triangles: wrong arity
    _, tris = rect_mesh(3.0, 2.0, 5, 3, "tri")
    assert rect_grid_of(tris, nodes.shape[0]) is None
    # renumbered connectivity: swapping two node ids breaks the match
    bad = elems.copy()
    bad[0, [0, 1]] = bad[0, [1, 0]]
    assert rect_grid_of(bad, nodes.shape[0]) is None


def test_box_detection():
    nodes, elems = box_mesh(1.0, 1.0, 2.0, 2, 3, 4)
    assert box_grid_of(elems, nodes.shape[0]) == (2, 3, 4)
    assert box_grid_of(elems[::-1], nodes.shape[0]) is None
    bad = elems.copy()
    bad[1, [2, 3]] = bad[1, [3, 2]]
    assert box_grid_of(bad, nodes.shape[0]) is None


def test_plane_ops_match_general():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nx, ny = 5, 3
    nodes, elems = rect_mesh(3.0, 2.0, nx, ny, "quad")
    dm = (2 * elems[:, :, None] + np.arange(2)).reshape(-1, 8)
    gather, scatter = make_plane_grid_ops(nx, ny)
    u = rng.standard_normal(2 * nodes.shape[0])
    # conftest runs jax in f32: compare at cast precision
    np.testing.assert_allclose(np.asarray(gather(jnp.asarray(u))),
                               u[dm].astype(np.float32), rtol=0,
                               atol=0)
    fe = rng.standard_normal((elems.shape[0], 8))
    f_gen = np.zeros(u.size)
    np.add.at(f_gen, dm, fe)
    np.testing.assert_allclose(np.asarray(scatter(jnp.asarray(fe))),
                               f_gen, rtol=1e-6, atol=1e-7)


def test_solid_ops_match_general():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    nx, ny, nz = 2, 3, 4
    nodes, elems = box_mesh(1.0, 1.0, 2.0, nx, ny, nz)
    dm = (3 * elems[:, :, None] + np.arange(3)).reshape(-1, 24)
    gather, scatter = make_solid_grid_ops(nx, ny, nz)
    u = rng.standard_normal(3 * nodes.shape[0])
    # conftest runs jax in f32: compare at cast precision
    np.testing.assert_allclose(np.asarray(gather(jnp.asarray(u))),
                               u[dm].astype(np.float32), rtol=0,
                               atol=0)
    fe = rng.standard_normal((elems.shape[0], 24))
    f_gen = np.zeros(u.size)
    np.add.at(f_gen, dm, fe)
    np.testing.assert_allclose(np.asarray(scatter(jnp.asarray(fe))),
                               f_gen, rtol=1e-6, atol=1e-7)
