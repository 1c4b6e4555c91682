"""Host-side (numpy, float64) dense operators for the small-problem tier.

WHY THIS EXISTS (round-3 VERDICT #1): on the TPU attachment every NEW XLA
program pays a 1-3 minute remote compile; a 6-node modal analysis that
costs microseconds of FLOPs was timing out 60 s HTTP routes because its
eager eigh/cholesky dispatches each compiled a fresh device program (and
the TPU eigh program additionally missed the persistent compile cache —
see BENCHMARKS.md "dynamics serving" notes).  Compile cost is set by
program complexity, not problem size, so BELOW the dense limit the right
hardware for eigensolves is the HOST: numpy/LAPACK runs the whole dense
analysis family (modal, buckling, harmonic, spectrum, random vibration,
reduction, small transients) in milliseconds, in float64, touching the
device zero times.

This module therefore re-implements dense assembly in pure numpy.  It is
NOT a second source of truth for the physics: every function mirrors the
corresponding jnp op 1:1 (assemble_system <-> host_stiffness, ops/mass <->
host_lumped/consistent_mass, ops/geometric <-> host_geometric_stiffness)
and tests/test_host.py pins them against each other.  The differentiable
traced paths (modal_eigenpairs, buckling_eigenvalues, the fused transient
programs) are untouched — identification and large-mesh work stay on
device where gradients and bandwidth live.

MLP material fields are evaluated on host by fetching their weights once
(np.asarray = pure transfer, no compile) and running the tiny forward in
numpy; fetched weights are cached per field object.

Reference cites: the reference's own NumPy assembly
(/root/reference/FEM/python/fem/assembly.py:16-75) is the capability
ancestor of this path — its element loop replaced by vectorized scatter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..models.fields import MLPField, ScalarField
from ..models.problem import TrussProblem

# Fetched-weight cache for MLP fields: keyed by id(field) but HOLDING the
# field object too — ids are reused after GC (CLAUDE.md), so the identity
# check below must compare the stored object, not trust the key.
_FIELD_CACHE: dict = {}
_FIELD_CACHE_CAP = 32


def _field_weights(field: MLPField):
    entry = _FIELD_CACHE.get(id(field))
    if entry is not None and entry[0] is field:
        return entry[1]
    layers = [(np.asarray(w, dtype=np.float64), np.asarray(b, dtype=np.float64))
              for w, b in field.layers]
    scale = float(np.asarray(field.scale))
    if len(_FIELD_CACHE) >= _FIELD_CACHE_CAP:
        _FIELD_CACHE.pop(next(iter(_FIELD_CACHE)))
    _FIELD_CACHE[id(field)] = (field, (layers, scale))
    return layers, scale


def eval_field_host(field, x: np.ndarray) -> np.ndarray:
    """Numpy mirror of Field.eval_batch: (n, k) inputs -> (n,) values.

    Matches models/fields.py exactly: _adapt_inputs column logic,
    tanh hidden layers, softplus positivity, scale."""
    x = np.asarray(x, dtype=np.float64)
    if isinstance(field, ScalarField):
        v = field.value
        if not isinstance(v, (np.ndarray, float, int, np.floating)):
            # Device-held scalar (a field built outside to_field): fetch
            # ONCE and cache — through a degraded attachment every
            # transfer can cost seconds, and analysis runs evaluate
            # fields many times (round-3 measurement: repeated scalar
            # fetches dominated a 6-node reduction's wall-clock).
            entry = _FIELD_CACHE.get(id(field))
            if entry is not None and entry[0] is field:
                return np.full(x.shape[0], entry[1])
            val = float(np.asarray(v))
            if len(_FIELD_CACHE) >= _FIELD_CACHE_CAP:
                _FIELD_CACHE.pop(next(iter(_FIELD_CACHE)))
            _FIELD_CACHE[id(field)] = (field, val)
            return np.full(x.shape[0], val)
        return np.full(x.shape[0], float(np.asarray(v)))
    if not isinstance(field, MLPField):
        # Duck-typed custom fields (tests define spatially-keyed helpers):
        # evaluate through their own eval_batch and fetch.  On TPU this
        # may dispatch tiny device ops — acceptable for the rare custom
        # field; the shipped field types stay compile-free above.
        return np.asarray(field.eval_batch(x), dtype=np.float64)
    layers, scale = _field_weights(field)
    width = x.shape[1]
    if field.input_dim < width:
        cols = np.concatenate([x[:, 1:], x[:, :1]], axis=1)
        x = cols[:, : field.input_dim]
    elif field.input_dim > width:
        x = np.concatenate(
            [x, np.zeros((x.shape[0], field.input_dim - width))], axis=1)
    h = x
    for w, b in layers[:-1]:
        h = np.tanh(h @ w + b)
    w, b = layers[-1]
    out = h @ w + b
    if field.enforce_positive:
        # Numerically-stable softplus (overflow-free for large inputs).
        out = np.logaddexp(0.0, out)
    return (out * scale)[:, 0]


def _geometry(problem: TrussProblem):
    """(dof_map, gvec, inv_len, mid) in numpy float64, cached per problem."""
    cached = getattr(problem, "_host_geometry_cache", None)
    if cached is not None:
        return cached
    coords = problem.node_coords_2d.astype(np.float64)
    i, j = problem.elements[:, 0], problem.elements[:, 1]
    dx = coords[j] - coords[i]
    lengths = np.linalg.norm(dx, axis=1)
    if np.any(lengths <= 0.0):
        raise ValueError("Element with zero initial length detected")
    cosines = dx / lengths[:, None]
    gvec = np.concatenate([-cosines, cosines], axis=1)
    inv_len = 1.0 / lengths
    mid = 0.5 * (coords[i] + coords[j])
    if problem.dimension == 1:
        dof_map = np.stack([i, j], axis=1)
    else:
        d = problem.dimension
        dof_map = np.concatenate(
            [np.stack([d * n + c for c in range(d)], axis=1) for n in (i, j)],
            axis=1)
    out = (dof_map.astype(np.int64), gvec, inv_len, mid)
    problem._host_geometry_cache = out
    return out


def _assembly_inputs(problem: TrussProblem, load_factor: float) -> np.ndarray:
    _, _, _, mid = _geometry(problem)
    n = mid.shape[0]
    lf = np.full((n, 1), float(load_factor))
    return np.concatenate([lf, mid[:, : problem.dimension]], axis=1)


def material_values_host(problem: TrussProblem, load_factor: float = 1.0
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(young, area) at element midpoints, numpy float64."""
    x = _assembly_inputs(problem, load_factor)
    return (eval_field_host(problem.material.young, x),
            eval_field_host(problem.material.area, x))


def density_values_host(problem: TrussProblem,
                        load_factor: float = 1.0) -> np.ndarray:
    x = _assembly_inputs(problem, load_factor)
    return eval_field_host(problem.material.density, x)


def _scatter_blocks(problem: TrussProblem, ke: np.ndarray) -> np.ndarray:
    """(nelm, 2d, 2d) element blocks -> dense (ndof, ndof) global matrix."""
    dof_map, _, _, _ = _geometry(problem)
    ndof = problem.ndof
    k = np.zeros((ndof, ndof))
    rows = dof_map[:, :, None]
    cols = dof_map[:, None, :]
    np.add.at(k, (rows, cols), ke)
    return k


def host_stiffness(problem: TrussProblem,
                   load_factor: float = 1.0) -> np.ndarray:
    """Dense linear stiffness K (ndof, ndof), float64.

    Mirror of ops/assembly.assemble_system's K for u = 0 (linear
    kinematics: K is displacement-independent)."""
    dof_map, gvec, inv_len, _ = _geometry(problem)
    young, area = material_values_host(problem, load_factor)
    s = young * area * inv_len                       # (nelm,)
    ke = s[:, None, None] * gvec[:, :, None] * gvec[:, None, :]
    return _scatter_blocks(problem, ke)


def host_lumped_mass(problem: TrussProblem) -> np.ndarray:
    """(ndof,) lumped mass vector — mirror of ops/mass.lumped_mass."""
    dof_map, _, inv_len, _ = _geometry(problem)
    x = _assembly_inputs(problem, 1.0)
    rho = eval_field_host(problem.material.density, x)
    area = eval_field_host(problem.material.area, x)
    m_e = rho * area / inv_len
    m = np.zeros(problem.ndof)
    np.add.at(m, dof_map, np.broadcast_to((0.5 * m_e)[:, None],
                                          dof_map.shape))
    return m + problem.point_mass_dof()


def host_consistent_mass(problem: TrussProblem) -> np.ndarray:
    """Dense (ndof, ndof) consistent mass — mirror of
    ops/mass.consistent_mass."""
    dof_map, _, inv_len, _ = _geometry(problem)
    x = _assembly_inputs(problem, 1.0)
    rho = eval_field_host(problem.material.density, x)
    area = eval_field_host(problem.material.area, x)
    m_e = rho * area / inv_len
    d = problem.dimension
    eye_d = np.eye(d)
    pattern = np.block([[2.0 * eye_d, eye_d], [eye_d, 2.0 * eye_d]]) / 6.0
    me = m_e[:, None, None] * pattern[None, :, :]
    return _scatter_blocks(problem, me) + np.diag(problem.point_mass_dof())


def host_axial_forces(problem: TrussProblem, u: np.ndarray,
                      load_factor: float = 1.0) -> np.ndarray:
    """(nelm,) N_e = E A eps at state u — mirror of
    ops/geometric.element_axial_forces."""
    dof_map, gvec, inv_len, _ = _geometry(problem)
    young, area = material_values_host(problem, load_factor)
    u_e = np.asarray(u, dtype=np.float64).reshape(-1)[dof_map]
    strain = np.sum(gvec * u_e, axis=-1) * inv_len
    return young * area * strain


def host_geometric_stiffness(problem: TrussProblem,
                             n_e: np.ndarray) -> np.ndarray:
    """Dense (ndof, ndof) geometric stiffness K_g from element axial
    forces — mirror of ops/geometric.assemble_geometric."""
    _, _, inv_len, _ = _geometry(problem)
    d = problem.dimension
    eye_d = np.eye(d)
    pattern = np.block([[eye_d, -eye_d], [-eye_d, eye_d]])
    coef = np.asarray(n_e, dtype=np.float64) * inv_len
    ke = coef[:, None, None] * pattern[None, :, :]
    return _scatter_blocks(problem, ke)


def host_nonlinear_system(problem: TrussProblem, u: np.ndarray,
                          load_factor: float = 1.0
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(K_tangent, f_int) of the Green-Lagrange truss at state u —
    numpy float64 mirror of ops/assembly.assemble_system_nonlinear /
    ops/elements.truss2d_green_lagrange_batch (same cancellation-free
    e_gl, same variationally consistent material + initial-stress
    tangent).  Powers the host tier of the arc-length continuation
    (solvers/riks.py)."""
    if problem.dimension not in (2, 3):
        raise ValueError("geometric nonlinearity requires a 2D or 3D truss")
    dof_map, gvec, inv_len, _ = _geometry(problem)
    young, area = material_values_host(problem, load_factor)
    dim = problem.dimension
    dx0 = gvec[:, dim:] / inv_len[:, None]
    u_e = np.asarray(u, dtype=np.float64).reshape(-1)[dof_map]
    u2 = u_e.reshape(u_e.shape[0], 2, dim)
    delta = u2[:, 1, :] - u2[:, 0, :]
    dx = dx0 + delta
    inv_l0_sq = inv_len * inv_len
    e_gl = (np.sum(dx0 * delta, axis=-1)
            + 0.5 * np.sum(delta * delta, axis=-1)) * inv_l0_sq
    d = np.concatenate([-dx, dx], axis=1)
    ea_invl = young * area * inv_len
    ke_mat = (ea_invl * inv_l0_sq)[:, None, None] * (
        d[:, :, None] * d[:, None, :])
    eye_d = np.eye(dim)
    b_geo = np.block([[eye_d, -eye_d], [-eye_d, eye_d]])
    ke = ke_mat + (ea_invl * e_gl)[:, None, None] * b_geo[None, :, :]
    fe = (ea_invl * e_gl)[:, None] * d
    k = _scatter_blocks(problem, ke)
    f_int = np.zeros(problem.ndof)
    np.add.at(f_int, dof_map, fe)
    return k, f_int


def host_return_map(eps: np.ndarray, eps_p: np.ndarray, alpha: np.ndarray,
                    back: np.ndarray, young: np.ndarray, sigma_y: np.ndarray,
                    h_iso: np.ndarray, h_kin: np.ndarray):
    """Numpy float64 mirror of ops/plastic.return_map (same radial return,
    same algorithmic tangent).  State is passed/returned as bare arrays so
    this file keeps zero jax imports.

    Returns (sigma, e_tan, eps_p_new, alpha_new, back_new)."""
    sigma_tr = young * (eps - eps_p)
    xi = sigma_tr - back
    sgn = np.sign(xi)
    f_tr = np.abs(xi) - (sigma_y + h_iso * alpha)
    denom = young + h_iso + h_kin
    dgamma = np.maximum(f_tr, 0.0) / denom
    plastic = f_tr > 0.0
    sigma = sigma_tr - young * dgamma * sgn
    e_tan = np.where(plastic, young * (h_iso + h_kin) / denom, young)
    return (sigma, e_tan, eps_p + dgamma * sgn, alpha + dgamma,
            back + h_kin * dgamma * sgn)


def host_plastic_system(problem: TrussProblem, u: np.ndarray,
                        eps_p: np.ndarray, alpha: np.ndarray,
                        back: np.ndarray, sigma_y: np.ndarray,
                        h_iso: np.ndarray, h_kin: np.ndarray,
                        load_factor: float = 1.0,
                        tangent_floor: float = 1e-8):
    """(K_t, f_int, sigma, new_state_arrays) of the elastoplastic truss —
    float64 mirror of ops/plastic.assemble_plastic_system (same small-
    strain kinematics eps = g.u_e / L0, same stabilized tangent floor).
    Powers the host tier of solvers/plasticity.py below DENSE_DOF_LIMIT."""
    dof_map, gvec, inv_len, _ = _geometry(problem)
    young, area = material_values_host(problem, load_factor)
    u_e = np.asarray(u, dtype=np.float64).reshape(-1)[dof_map]
    eps = np.sum(gvec * u_e, axis=-1) * inv_len
    sigma, e_tan, eps_p_n, alpha_n, back_n = host_return_map(
        eps, eps_p, alpha, back, young, sigma_y, h_iso, h_kin)
    e_stab = np.maximum(e_tan, tangent_floor * young)
    s_tan = e_stab * area * inv_len
    ke = s_tan[:, None, None] * gvec[:, :, None] * gvec[:, None, :]
    k_t = _scatter_blocks(problem, ke)
    fe = (area * sigma)[:, None] * gvec
    f_int = np.zeros(problem.ndof)
    np.add.at(f_int, dof_map, fe)
    return k_t, f_int, sigma, (eps_p_n, alpha_n, back_n)


def host_masks(problem: TrussProblem) -> np.ndarray:
    """(ndof,) free mask (1.0 free / 0.0 fixed)."""
    mask = np.ones(problem.ndof)
    if problem.fixed_dofs.size:
        mask[np.unique(problem.fixed_dofs)] = 0.0
    return mask


def host_static_solve(problem: TrussProblem,
                      loads: Optional[np.ndarray] = None,
                      k: Optional[np.ndarray] = None) -> np.ndarray:
    """Masked linear static solve K u = f on the free block (numpy).

    Mirror of ops/linalg.masked_solve's contract: zeros on fixed DOFs."""
    mask = host_masks(problem)
    k = host_stiffness(problem) if k is None else k
    f = problem.loads if loads is None else np.asarray(loads, dtype=float)
    km = mask[:, None] * k * mask[None, :] + np.diag(1.0 - mask)
    return np.linalg.solve(km, f * mask) * mask


def loads_of(problem: TrussProblem, data=None) -> np.ndarray:
    """Effective load vector: data overrides problem (callers may pass a
    ProblemData with replaced loads); np.asarray is a transfer, never a
    compile."""
    if data is not None:
        return np.asarray(data.loads, dtype=np.float64)
    return np.asarray(problem.loads, dtype=np.float64)
