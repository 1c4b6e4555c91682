"""Truss problem definition: host-side model + device-side SoA pytree.

Capability parity with the reference data model
(/root/reference/FEM/python/fem/model.py: FEMModel, validation at
model.py:53-77) but redesigned for XLA: all per-element quantities that the
reference recomputed inside Python element loops (DOF maps, lengths,
direction cosines, midpoints — geometry.py:8-18, element.py:15-102) are
precomputed ONCE into dense arrays so assembly is a single vectorized
gather/scatter program.

Key identity exploited throughout: for the linear truss kernels (1D and 2D)
the element stiffness factorizes as  ke = s_e * g_e g_e^T  with
s_e = E_e A_e / L_e and g_e the signed direction vector
(1D: [-1, +1]; 2D: [-c, -s, +c, +s]).  Strain is eps_e = (g_e . u_e) / L_e
and the internal force is fe = s_e (g_e . u_e) g_e.  This turns the whole
assembly into one outer-product + scatter-add, exactly what the TPU
vector unit + XLA scatter want.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.runtime import default_dtype
from .fields import Material


def element_dofs(node_i: int, node_j: int) -> np.ndarray:
    """2D element DOF map (reference geometry.py:8-9)."""
    return np.array([2 * node_i, 2 * node_i + 1, 2 * node_j, 2 * node_j + 1], dtype=int)


def free_and_fixed_dofs(ndof: int, fixed_dofs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Partition DOFs into (free, fixed) index arrays (reference boundary.py:8-13)."""
    fixed = np.unique(np.asarray(fixed_dofs, dtype=int).reshape(-1))
    mask = np.ones(ndof, dtype=bool)
    mask[fixed] = False
    return np.flatnonzero(mask), fixed


def split_element_data(
    nodes: np.ndarray, disp: np.ndarray, node_i: int, node_j: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x_i0, x_j0, u_i, u_j) for one 2D element (reference geometry.py:12-18)."""
    x_i0 = nodes[node_i]
    x_j0 = nodes[node_j]
    u_i = np.array([disp[2 * node_i], disp[2 * node_i + 1]], dtype=float)
    u_j = np.array([disp[2 * node_j], disp[2 * node_j + 1]], dtype=float)
    return x_i0, x_j0, u_i, u_j


@struct.dataclass
class ProblemData:
    """Device-resident structure-of-arrays view of a truss problem.

    Every field is a traced array, so one compiled solver program serves any
    problem with the same (nnode, nelm, dimension) signature — mesh geometry,
    loads and BC pattern can all change without recompilation.
    """

    dof_map: jnp.ndarray  # (nelm, 2*dim) int32 global DOF indices per element
    gvec: jnp.ndarray     # (nelm, 2*dim) signed direction vector g_e
    inv_len: jnp.ndarray  # (nelm,) 1 / L0
    mid: jnp.ndarray      # (nelm, dim) element midpoint coordinates
    loads: jnp.ndarray    # (ndof,) external load vector
    free_mask: jnp.ndarray   # (ndof,) 1.0 on free DOFs, 0.0 on fixed
    fixed_mask: jnp.ndarray  # (ndof,) 1.0 on fixed DOFs
    # Transposed incidence (ndof, max_valence) for scatter-free accumulation
    # (see ops/scatter.py).
    gather_map: jnp.ndarray = None
    # (ndof,) non-structural (payload) mass per DOF — a node's point mass
    # replicated onto each of its translational DOFs; zeros by default.
    # ops/mass adds it to every lumped/consistent matrix, so the whole
    # dynamics family (modal, transient, spectrum, harmonic, random,
    # identification, sizing) sees payload mass through one field.
    point_mass: jnp.ndarray = None
    dimension: int = struct.field(pytree_node=False, default=2)

    @property
    def ndof(self) -> int:
        return self.loads.shape[0]

    @property
    def nelm(self) -> int:
        return self.dof_map.shape[0]


@dataclass
class TrussProblem:
    """Host-side problem container with reference-equivalent validation.

    Reference cites: FEMModel fields and shape checks (model.py:46-91).
    """

    nodes: np.ndarray          # (nnode,) for 1D or (nnode, dim) for 2D/3D
    elements: np.ndarray       # (nelm, 2) int
    material: Material
    loads: np.ndarray          # (ndof,)
    fixed_dofs: np.ndarray     # (nfixed,) int
    dimension: int = 2
    # Optional (nnode,) non-structural (payload) point masses — equipment,
    # deck loads, tuned-mass hardware.  Each node's mass acts on all of
    # its translational DOFs (the standard lumped payload idealization).
    # The reference has no mass concept at all (statics-only; SURVEY
    # §7.3); this extends the dynamics family the natural way.
    point_masses: Optional[np.ndarray] = None

    def __post_init__(self) -> None:
        self.nodes = np.asarray(self.nodes, dtype=float)
        self.elements = np.asarray(self.elements, dtype=int)
        self.loads = np.asarray(self.loads, dtype=float).reshape(-1)
        self.fixed_dofs = np.asarray(self.fixed_dofs, dtype=int).reshape(-1)
        if self.point_masses is not None:
            self.point_masses = np.asarray(self.point_masses,
                                           dtype=float).reshape(-1)
            if self.point_masses.size != self.nnode:
                raise ValueError(
                    f"point_masses must have one value per node "
                    f"({self.nnode}), got {self.point_masses.size}")
            if not np.all(np.isfinite(self.point_masses)) \
                    or np.any(self.point_masses < 0.0):
                raise ValueError("point_masses must be finite and "
                                 "nonnegative")
            if not np.any(self.point_masses):
                self.point_masses = None       # all-zero == absent

        if self.dimension not in (1, 2, 3):
            raise ValueError("dimension must be 1, 2 or 3")
        if self.dimension == 1 and self.nodes.ndim != 1:
            raise ValueError("For 1D, nodes must be 1D array of positions")
        if self.dimension >= 2 and (
            self.nodes.ndim != 2 or self.nodes.shape[1] != self.dimension
        ):
            raise ValueError(
                f"For {self.dimension}D, nodes must have shape "
                f"(nnode, {self.dimension})"
            )
        if self.elements.ndim != 2 or self.elements.shape[1] != 2:
            raise ValueError("elements must have shape (nelm, 2)")
        if self.loads.size != self.ndof:
            raise ValueError(f"loads size must be {self.ndof}, got {self.loads.size}")
        if self.fixed_dofs.size and (
            self.fixed_dofs.min() < 0 or self.fixed_dofs.max() >= self.ndof
        ):
            raise ValueError("fixed_dofs contain out-of-range indices")

    @property
    def nnode(self) -> int:
        return self.nodes.shape[0]

    @property
    def nelm(self) -> int:
        return self.elements.shape[0]

    @property
    def ndof(self) -> int:
        return self.nnode * self.dimension

    @property
    def node_coords_2d(self) -> np.ndarray:
        """(nnode, dim) view of node coordinates regardless of dimension."""
        return self.nodes.reshape(self.nnode, self.dimension)

    def free_fixed(self) -> Tuple[np.ndarray, np.ndarray]:
        return free_and_fixed_dofs(self.ndof, self.fixed_dofs)

    def point_mass_dof(self) -> np.ndarray:
        """(ndof,) payload mass per DOF (each node's point mass on all
        of its translational DOFs); zeros when absent."""
        if self.point_masses is None:
            return np.zeros(self.ndof)
        return np.repeat(self.point_masses, self.dimension)

    def element_midpoints(self) -> np.ndarray:
        coords = self.node_coords_2d
        i, j = self.elements[:, 0], self.elements[:, 1]
        return 0.5 * (coords[i] + coords[j])

    # Element count above which the native (C++) preprocessing path is
    # preferred when built — single O(n) passes instead of numpy's
    # O(n log n) sorts and temporaries.
    NATIVE_PREPROCESS_MIN_ELEMENTS = 4096

    def to_device(self, dtype=None, use_native: Optional[bool] = None) -> ProblemData:
        """Precompute the SoA geometry arrays and move them on device.

        use_native: force the C++ preprocessing on/off; default auto
        (native when built and the mesh is large enough to matter).
        """
        dtype = dtype or default_dtype()

        from ..utils import native as native_mod

        if use_native is None:
            use_native = (
                native_mod.available()
                and self.nelm >= self.NATIVE_PREPROCESS_MIN_ELEMENTS
            )

        coords = self.node_coords_2d
        if use_native and native_mod.available():
            geo = native_mod.compute_geometry_native(
                coords, self.elements, self.dimension
            )
            gvec, inv_lengths, mids, dof_map = geo
            lengths = None
            gather_map = native_mod.build_gather_map_native(dof_map, self.ndof)
        else:
            i, j = self.elements[:, 0], self.elements[:, 1]
            dx = coords[j] - coords[i]                      # (nelm, dim)
            lengths = np.linalg.norm(dx, axis=1)
            if np.any(lengths <= 0.0):
                raise ValueError("Element with zero initial length detected")
            cosines = dx / lengths[:, None]                 # (nelm, dim)
            # Signed direction vector: eps = (g.u_e)/L0, ke = s g g^T.
            gvec = np.concatenate([-cosines, cosines], axis=1)
            inv_lengths = 1.0 / lengths
            mids = 0.5 * (coords[i] + coords[j])

            if self.dimension == 1:
                dof_map = np.stack([i, j], axis=1)
            else:
                d = self.dimension
                dof_map = np.concatenate(
                    [np.stack([d * n + c for c in range(d)], axis=1)
                     for n in (i, j)],
                    axis=1,
                )

            from ..ops.scatter import build_gather_map

            gather_map = build_gather_map(dof_map, self.ndof)

        free_mask = np.ones(self.ndof)
        if self.fixed_dofs.size:
            free_mask[np.unique(self.fixed_dofs)] = 0.0

        return ProblemData(
            dof_map=jnp.asarray(dof_map, dtype=jnp.int32),
            gvec=jnp.asarray(gvec, dtype=dtype),
            inv_len=jnp.asarray(inv_lengths, dtype=dtype),
            mid=jnp.asarray(mids, dtype=dtype),
            loads=jnp.asarray(self.loads, dtype=dtype),
            free_mask=jnp.asarray(free_mask, dtype=dtype),
            fixed_mask=jnp.asarray(1.0 - free_mask, dtype=dtype),
            gather_map=jnp.asarray(gather_map, dtype=jnp.int32),
            point_mass=jnp.asarray(self.point_mass_dof(), dtype=dtype),
            dimension=self.dimension,
        )
