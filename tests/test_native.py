"""Native (C++) mesh-preprocessing library: build + parity with numpy."""

import numpy as np
import pytest

from pinn_fem_tpu.ops.scatter import build_gather_map
from pinn_fem_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    ok = native.build()
    if not ok:
        pytest.skip("g++/make unavailable; native path is optional")
    assert native.available()


def random_mesh(n_nodes=500, n_extra=800, seed=0):
    """A chain plus random extra bracing elements (varied valence)."""
    rng = np.random.default_rng(seed)
    coords = np.stack([np.arange(n_nodes, dtype=float),
                       rng.normal(size=n_nodes)], axis=1)
    chain = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    a = rng.integers(0, n_nodes, size=n_extra)
    b = (a + rng.integers(1, 5, size=n_extra)) % n_nodes
    extra = np.stack([a, b], axis=1)
    extra = extra[extra[:, 0] != extra[:, 1]]
    return coords, np.concatenate([chain, extra])


def test_gather_map_matches_numpy():
    coords, elements = random_mesh()
    i, j = elements[:, 0], elements[:, 1]
    dof_map = np.stack([2 * i, 2 * i + 1, 2 * j, 2 * j + 1], axis=1)
    ndof = 2 * coords.shape[0]
    ref = build_gather_map(dof_map, ndof)
    nat = native.build_gather_map_native(dof_map, ndof)
    np.testing.assert_array_equal(ref, nat)


def test_geometry_matches_numpy():
    coords, elements = random_mesh(seed=3)
    gvec, inv_len, mid, dof_map = native.compute_geometry_native(
        coords, elements, 2
    )
    ii, jj = elements[:, 0], elements[:, 1]
    dx = coords[jj] - coords[ii]
    lengths = np.linalg.norm(dx, axis=1)
    np.testing.assert_allclose(inv_len, 1.0 / lengths, rtol=1e-12)
    np.testing.assert_allclose(mid, 0.5 * (coords[ii] + coords[jj]), rtol=1e-12)
    cos = dx / lengths[:, None]
    np.testing.assert_allclose(gvec, np.concatenate([-cos, cos], axis=1),
                               rtol=1e-12)
    np.testing.assert_array_equal(
        dof_map, np.stack([2 * ii, 2 * ii + 1, 2 * jj, 2 * jj + 1], axis=1)
    )


def test_zero_length_detection():
    coords = np.array([[0.0, 0.0], [0.0, 0.0]])
    elements = np.array([[0, 1]])
    with pytest.raises(ValueError, match="zero initial length"):
        native.compute_geometry_native(coords, elements, 2)


def test_problem_to_device_native_path_equivalence():
    from pinn_fem_tpu import Material, TrussProblem

    coords, elements = random_mesh(n_nodes=300, n_extra=200, seed=5)
    loads = np.zeros(2 * coords.shape[0])
    loads[-2] = 1.0
    mat = Material(young=2.0, area=0.5, density=1.0)
    p = TrussProblem(coords, elements, mat, loads, np.array([0, 1, 3]), 2)

    d_np = p.to_device(use_native=False)
    d_cc = p.to_device(use_native=True)
    np.testing.assert_allclose(np.asarray(d_np.gvec), np.asarray(d_cc.gvec),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_np.inv_len),
                               np.asarray(d_cc.inv_len), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_np.dof_map),
                                  np.asarray(d_cc.dof_map))
    np.testing.assert_array_equal(np.asarray(d_np.gather_map),
                                  np.asarray(d_cc.gather_map))
