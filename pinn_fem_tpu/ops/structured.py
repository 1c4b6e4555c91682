"""Structured-grid gather/scatter: slice-rate FEM accumulation on TPU.

Random per-element indexing runs near SCALAR rate on TPU (measured in
ops/scatter.py: gather- and scatter-based accumulation both cost
~70-90 ms per 1M slots — XLA lowers random indexing to per-element
access).  But the generated rect/box meshes (models/plane.rect_mesh,
models/solid.box_mesh) have CANONICAL connectivity: element (i, j[, k])
touches the nodes at grid offsets {0,1}^d, so both hot movements of an
explicit step decompose into 2^d dense SLICES of the node grid:

    gather   u_e[j, i, corner]  = u_grid[j + dj, i + di]
    scatter  f_grid[j+dj, i+di] += fe[j, i, corner]      (slice-add)

— contiguous, vectorizable, no index vectors at all.  Measured on the
chip (benchmarks/scaling.py plastic): the 4096-element plane plastic
step went from 14.9 ms (scatter-add) to slice-rate; this module is why
the continuum explicit integrators ask for the grid before falling
back to `.at[dm].add`.

Detection is on CONNECTIVITY ONLY (the node coordinates may be
anything): the element table must equal the generator's canonical
enumeration (x-fastest nodes, i-fastest elements).  Meshes from other
sources fall back to the general gather/scatter path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def rect_grid_of(elements: np.ndarray,
                 nnode: int) -> Optional[Tuple[int, int]]:
    """(nx, ny) if `elements` is exactly rect_mesh(nx, ny, "quad")
    connectivity for nnode = (nx+1)(ny+1), else None."""
    el = np.asarray(elements)
    if el.ndim != 2 or el.shape[1] != 4 or el.shape[0] == 0:
        return None
    nx1 = int(el[0, 3]) - int(el[0, 0])
    if nx1 < 2 or nnode % nx1:
        return None
    nx, ny = nx1 - 1, nnode // nx1 - 1
    if nx < 1 or ny < 1 or el.shape[0] != nx * ny:
        return None
    i = np.arange(nx)
    j = np.arange(ny)
    n00 = (j[:, None] * nx1 + i[None, :]).reshape(-1)
    expect = np.stack([n00, n00 + 1, n00 + 1 + nx1, n00 + nx1], 1)
    return (nx, ny) if np.array_equal(el, expect) else None


def box_grid_of(elements: np.ndarray,
                nnode: int) -> Optional[Tuple[int, int, int]]:
    """(nx, ny, nz) if `elements` is exactly box_mesh connectivity
    (x-fastest node ids, iz-major elements), else None."""
    el = np.asarray(elements)
    if el.ndim != 2 or el.shape[1] != 8 or el.shape[0] == 0:
        return None
    nx1 = int(el[0, 1]) - int(el[0, 0])  # +x neighbour offset is 1
    if nx1 != 1:
        return None
    nx1 = int(el[0, 3]) - int(el[0, 0])  # +y neighbour offset = nx+1
    ny1xnx1 = int(el[0, 4]) - int(el[0, 0])  # +z offset = (nx+1)(ny+1)
    if nx1 < 2 or ny1xnx1 < nx1 or ny1xnx1 % nx1:
        return None
    ny1 = ny1xnx1 // nx1
    if nnode % ny1xnx1:
        return None
    nx, ny, nz = nx1 - 1, ny1 - 1, nnode // ny1xnx1 - 1
    if min(nx, ny, nz) < 1 or el.shape[0] != nx * ny * nz:
        return None
    ix = np.arange(nx)
    iy = np.arange(ny)
    iz = np.arange(nz)
    n0 = (ix[None, None, :] + nx1 * (iy[None, :, None]
                                     + ny1 * iz[:, None, None])
          ).reshape(-1)
    off = np.array([0, 1, 1 + nx1, nx1,
                    ny1xnx1, ny1xnx1 + 1, ny1xnx1 + 1 + nx1,
                    ny1xnx1 + nx1])
    expect = n0[:, None] + off[None, :]
    return (nx, ny, nz) if np.array_equal(el, expect) else None


_Q4_OFF = ((0, 0), (0, 1), (1, 1), (1, 0))        # (dj, di) per corner
_HEX_OFF = ((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
            (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0))  # (dk, dj, di)


def make_plane_grid_ops(nx: int, ny: int):
    """(gather, scatter) jnp closures for a (nx, ny) Q4 grid with
    2 DOFs/node in the [u1 v1 u2 v2 ..] element order:

        gather(u (ndof,)) -> u_e (m, 8)
        scatter(fe (m, 8)) -> f (ndof,)
    """
    import jax.numpy as jnp

    def gather(u):
        g = u.reshape(ny + 1, nx + 1, 2)
        parts = [g[dj:dj + ny, di:di + nx] for dj, di in _Q4_OFF]
        return jnp.stack(parts, axis=2).reshape(nx * ny, 8)

    def scatter(fe):
        fg = fe.reshape(ny, nx, 4, 2)
        f = jnp.zeros((ny + 1, nx + 1, 2), fe.dtype)
        for c, (dj, di) in enumerate(_Q4_OFF):
            f = f.at[dj:dj + ny, di:di + nx].add(fg[:, :, c])
        return f.reshape(-1)

    return gather, scatter


def make_solid_grid_ops(nx: int, ny: int, nz: int):
    """(gather, scatter) for a (nx, ny, nz) hex8 grid, 3 DOFs/node."""
    import jax.numpy as jnp

    def gather(u):
        g = u.reshape(nz + 1, ny + 1, nx + 1, 3)
        parts = [g[dk:dk + nz, dj:dj + ny, di:di + nx]
                 for dk, dj, di in _HEX_OFF]
        return jnp.stack(parts, axis=3).reshape(nx * ny * nz, 24)

    def scatter(fe):
        fg = fe.reshape(nz, ny, nx, 8, 3)
        f = jnp.zeros((nz + 1, ny + 1, nx + 1, 3), fe.dtype)
        for c, (dk, dj, di) in enumerate(_HEX_OFF):
            f = f.at[dk:dk + nz, dj:dj + ny, di:di + nx].add(
                fg[:, :, :, c])
        return f.reshape(-1)

    return gather, scatter
