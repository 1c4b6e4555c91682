"""Explicit elastoplastic transients on the continuum families
(solvers/continuum_transient_plastic.py).

Anchors, per the module docstring's promises:
  * sub-yield the integrator IS the elastic central difference — pinned
    against an independent dense-K recurrence written here (not against
    the solver's own internals);
  * energy bookkeeping: KE + SE_elastic + W_plastic tracks the external
    work at every record, and plastic work is monotone (dissipation
    positivity);
  * a damped pulse past yield settles onto the RESIDUAL state of the
    homogeneous uniaxial strip: u_x = x·ε_p, u_y = −y·ε_p/2 (plane
    stress, incompressible flow), stress-free — so the probe
    displacement equals W·α with α the equivalent plastic strain;
  * f32 device scan mirrors the f64 host loop (explicit-recurrence
    bound, the tests/test_host.py doctrine).
"""

import numpy as np
import pytest

from pinn_fem_tpu.models.plane import (PlaneProblem, edge_load,
                                       plane_matrices, rect_mesh)
from pinn_fem_tpu.models.solid import (SolidProblem, boundary_quads,
                                       box_mesh, solid_matrices,
                                       surface_load)
from pinn_fem_tpu.solvers.continuum_transient_plastic import (
    solve_plane_transient_plastic, solve_solid_transient_plastic)

E, NU, T, RHO = 200.0, 0.3, 0.5, 2.0
W, H, Q = 4.0, 2.0, 10.0


def strip(element="quad", nx=4, ny=2, plane_strain=False, q=Q):
    """Uniaxial strip: left edge fixed in x, bottom in y, uniform
    traction q on the right edge — exact homogeneous σ_xx = q at any
    mesh, so the plastic state stays element-uniform and the residual
    field has the closed form in the module docstring."""
    nodes, elems = rect_mesh(W, H, nx, ny, element)
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    fixed = np.concatenate([2 * left, 2 * bottom + 1])
    right = np.flatnonzero(nodes[:, 0] == W)
    order = right[np.argsort(nodes[right, 1])]
    loads = edge_load(nodes, order, [q, 0.0], T)
    return PlaneProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, thickness=T, density=RHO,
                        loads=loads, fixed_dofs=fixed,
                        plane_strain=plane_strain)


def solid_bar(nx=1, ny=1, nz=4, sigma=Q):
    """Box pulled in +z with symmetry supports: homogeneous uniaxial
    σ_zz = sigma (the tests/test_solid.py anchor geometry)."""
    nodes, elems = box_mesh(1.0, 1.0, 4.0, nx, ny, nz)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-12)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-12)
    fixed = np.concatenate([3 * bot + 2, 3 * x0, 3 * y0 + 1])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=NU,
                     density=RHO, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    loads = surface_load(nodes, boundary_quads(p, 2, +1),
                         [0.0, 0.0, sigma])
    return SolidProblem(nodes=nodes, elements=elems, young=E,
                        poisson=NU, density=RHO, loads=loads,
                        fixed_dofs=fixed)


def elastic_reference(k, m_consistent, mask, loads, dt, n_steps,
                      amp, alpha_c, record_every, probe):
    """Independent elastic central difference: dense K, row-sum lumped
    mass, the same start-up step u_{-1} = ½dt²a₀ the solver documents."""
    m = np.asarray(m_consistent).sum(axis=1) * mask + (1.0 - mask)
    inv_m = np.where(m > 0, 1.0 / m, 0.0)
    f0 = loads * mask
    dt2 = dt * dt
    u = np.zeros(mask.size)
    u_prev = 0.5 * dt2 * inv_m * (amp[0] * f0) * mask
    out = []
    for i in range(n_steps):
        v_lag = (u - u_prev) / dt
        u_next = (2.0 * u - u_prev + dt2 * inv_m
                  * (amp[i] * f0 - k @ u - alpha_c * m * v_lag)) * mask
        u_prev, u = u, u_next
        if (i + 1) % record_every == 0:
            out.append(u[probe].copy())
    return np.asarray(out)


@pytest.mark.parametrize("element,plane_strain",
                         [("tri", False), ("quad", False),
                          ("tri", True)])
def test_plane_elastic_limit_matches_recurrence(element, plane_strain):
    """Unreachable yield: the plastic integrator reproduces the elastic
    central difference displacement-for-displacement (f_int from the
    return map is exactly K·u sub-yield)."""
    p = strip(element, plane_strain=plane_strain)
    n = 300
    amp = np.sin(np.linspace(0.0, 6.0, n))
    res = solve_plane_transient_plastic(
        p, sigma_y=1e9, n_steps=n, amplitude=amp, damping=(0.7, 0.0),
        record_every=10, host=True, bbar=False)
    k, m = plane_matrices(p)
    ref = elastic_reference(k, m, p.free_mask(), p.loads, res.dt, n,
                            amp, 0.7, 10, np.arange(p.ndof))
    np.testing.assert_allclose(res.displacements, ref, rtol=1e-9,
                               atol=1e-14)
    assert res.plastic_work[-1] == 0.0
    assert np.all(res.final_eq_plastic == 0.0)


def test_solid_elastic_limit_matches_recurrence():
    p = solid_bar()
    n = 200
    amp = np.ones(n)
    res = solve_solid_transient_plastic(
        p, sigma_y=1e9, n_steps=n, record_every=10, host=True)
    k, m = solid_matrices(p)
    ref = elastic_reference(k, m, p.free_mask(), p.loads, res.dt, n,
                            amp, 0.0, 10, np.arange(p.ndof))
    np.testing.assert_allclose(res.displacements, ref, rtol=1e-9,
                               atol=1e-14)
    assert res.plastic_work[-1] == 0.0


@pytest.mark.parametrize("kind", ["plane", "solid"])
def test_energy_balance_past_yield(kind):
    """Step load whose dynamic overshoot (2×) crosses yield: the energy
    books close at every record and dissipation is monotone."""
    if kind == "plane":
        res = solve_plane_transient_plastic(
            strip(), sigma_y=12.0, hardening_iso=20.0, n_steps=2000,
            record_every=20, host=True)
    else:
        # half the stable step: the recorded KE uses the LAGGED
        # half-step velocity, and at the stability limit the solid's
        # stiffest ringing mode makes that O(dt) mismatch ~2.5%.
        from pinn_fem_tpu.models.solid import solid_stable_dt

        p = solid_bar()
        res = solve_solid_transient_plastic(
            p, sigma_y=12.0, hardening_iso=20.0,
            dt=0.5 * solid_stable_dt(p), n_steps=4000,
            record_every=40, host=True)
    w_in = res.external_work
    e_sum = res.kinetic_energy + res.strain_energy + res.plastic_work
    scale = np.abs(w_in).max()
    np.testing.assert_allclose(e_sum, w_in, atol=0.02 * scale)
    assert res.plastic_work[-1] > 0.05 * scale
    assert np.all(np.diff(res.plastic_work) >= -1e-12 * scale)
    assert res.von_mises_envelope.max() > 12.0


def test_plane_residual_state_after_damped_pulse():
    """Pulse past yield + mass damping → the strip settles onto the
    stress-free residual field u_x = x·α, u_y = −y·α/2 (homogeneous
    plane-stress J2 flow is incompressible and the uniform ε_p is
    compatible, so no self-stress survives unloading)."""
    p = strip(nx=2, ny=1)
    # quasi-static ramp/hold/unload (each leg many fundamental
    # periods, heavy mass damping): a SHARP pulse excites waves whose
    # transient stress is non-uniform, leaving ~3% element-to-element
    # α scatter (measured) — the closed form needs uniform ε_p.
    n = 8000
    amp = np.concatenate([np.linspace(0.0, 1.6, 2500),
                          np.full(1000, 1.6),
                          np.linspace(1.6, 0.0, 2500),
                          np.zeros(2000)])
    nodes = p.nodes
    tip = np.flatnonzero((nodes[:, 0] == W) & (nodes[:, 1] == 0.0))[0]
    top = np.flatnonzero((nodes[:, 0] == 0.0) & (nodes[:, 1] == H))[0]
    res = solve_plane_transient_plastic(
        p, sigma_y=12.0, hardening_iso=20.0, n_steps=n, amplitude=amp,
        damping=(1.5, 0.0), record_every=50,
        probe_dofs=[2 * tip, 2 * top + 1], host=True)
    alpha = res.final_eq_plastic
    np.testing.assert_allclose(alpha, alpha[0], rtol=5e-3)  # uniform
    # analytic: σ_peak = 1.6·Q = 16 > σ_y = 12 quasi-statically, so
    # α = (σ_peak − σ_y)/H_iso = 0.2 exactly (plane-stress uniaxial).
    np.testing.assert_allclose(alpha.mean(), 0.2, rtol=1e-2)
    np.testing.assert_allclose(res.final_displacement[2 * tip],
                               W * alpha[0], rtol=2e-2)
    np.testing.assert_allclose(res.final_displacement[2 * top + 1],
                               -0.5 * H * alpha[0], rtol=3e-2)
    # settled: velocities died, plastic work froze after the pulse
    assert np.abs(res.velocities[-1]).max() < 1e-4
    i_half = len(res.times) // 2
    np.testing.assert_allclose(res.plastic_work[i_half:],
                               res.plastic_work[-1], rtol=1e-3)


@pytest.mark.parametrize("kind", ["plane", "quad_ps", "solid"])
def test_device_matches_host(kind):
    """f32 jitted scan vs f64 host loop past yield — the explicit
    mirror bound; quad_ps exercises the B-bar default branch."""
    n = 240
    amp = np.concatenate([np.linspace(0.0, 1.8, 120),
                          np.zeros(120)])
    kw = dict(sigma_y=12.0, hardening_iso=20.0, hardening_kin=5.0,
              n_steps=n, amplitude=amp, damping=(0.5, 0.0),
              record_every=20)
    if kind == "solid":
        p = solid_bar(nz=2)
        h = solve_solid_transient_plastic(p, host=True, **kw)
        d = solve_solid_transient_plastic(p, host=False, **kw)
    else:
        p = strip("quad", nx=2, ny=1,
                  plane_strain=(kind == "quad_ps"))
        h = solve_plane_transient_plastic(p, host=True, **kw)
        d = solve_plane_transient_plastic(p, host=False, **kw)
    scale = np.abs(h.displacements).max()
    np.testing.assert_allclose(d.displacements, h.displacements,
                               atol=5e-4 * scale)
    np.testing.assert_allclose(d.plastic_work[-1], h.plastic_work[-1],
                               rtol=5e-3, atol=1e-8)
    np.testing.assert_allclose(d.final_eq_plastic, h.final_eq_plastic,
                               atol=1e-6)
    np.testing.assert_allclose(d.von_mises_envelope,
                               h.von_mises_envelope,
                               rtol=5e-3, atol=1e-6)


def test_plane_strain_bbar_energy_books():
    """Plane-strain Q4 defaults to B-bar; the energy invariant must
    hold on that branch too (its ω_zz bookkeeping differs)."""
    res = solve_plane_transient_plastic(
        strip("quad", plane_strain=True), sigma_y=12.0,
        hardening_iso=20.0, n_steps=1500, record_every=25, host=True)
    w_in = res.external_work
    e_sum = res.kinetic_energy + res.strain_energy + res.plastic_work
    scale = np.abs(w_in).max()
    np.testing.assert_allclose(e_sum, w_in, atol=0.02 * scale)
    assert res.plastic_work[-1] > 0.0


def test_validation():
    p = strip(nx=2, ny=1)
    with pytest.raises(ValueError, match="multiple"):
        solve_plane_transient_plastic(p, sigma_y=1.0, n_steps=11,
                                      record_every=2)
    with pytest.raises(ValueError, match="amplitude"):
        solve_plane_transient_plastic(p, sigma_y=1.0, n_steps=10,
                                      amplitude=[1.0, 2.0])
    with pytest.raises(ValueError, match="B-bar"):
        solve_plane_transient_plastic(strip("tri", plane_strain=True),
                                      sigma_y=1.0, n_steps=10,
                                      bbar=True)
    pre = strip(nx=2, ny=1)
    pre = PlaneProblem(nodes=pre.nodes, elements=pre.elements,
                       young=E, poisson=NU, thickness=T, density=RHO,
                       loads=pre.loads, fixed_dofs=pre.fixed_dofs,
                       prescribed=np.full(pre.fixed_dofs.size, 0.1))
    with pytest.raises(ValueError, match="homogeneous"):
        solve_plane_transient_plastic(pre, sigma_y=1.0, n_steps=10)


# ---------------------------------------------------------------------------
# JSON tier: "plasticity" inside a transient analysis block
# (io/plane_io.py, io/solid_io.py riding io/_common.py's shared runner)
# ---------------------------------------------------------------------------


def plane_doc(**analysis_extra):
    analysis = {"type": "transient", "n_steps": 200,
                "record_every": 20, "damping": [0.5, 0.0],
                "probe_nodes": "right",
                "plasticity": {"sigma_y": 12.0, "hardening": 20.0}}
    analysis.update(analysis_extra)
    return {
        "element_type": "plane",
        "mesh": {"type": "rect", "width": W, "height": H,
                 "nx": 2, "ny": 1, "element": "quad"},
        "material": {"young": E, "poisson": NU, "thickness": T,
                     "density": RHO},
        "fixed_x_nodes": "left", "fixed_y_nodes": "bottom",
        "edge_loads": [{"nodes": "right", "traction": [1.6 * Q, 0.0]}],
        "analysis": analysis,
    }


def test_json_plane_transient_plastic_matches_solver():
    from pinn_fem_tpu.io.plane_io import run_plane_document

    out = run_plane_document(plane_doc())
    assert out["success"] is True
    assert out["analysis"] == "transient" and out["plastic"] is True
    assert out["element_type"] == "plane"
    # the same problem through the Python API, dt=auto both ways
    p = strip("quad", nx=2, ny=1, q=1.6 * Q)
    right = np.flatnonzero(p.nodes[:, 0] == W)
    right = right[np.argsort(p.nodes[right, 1])]
    probe = np.stack([2 * right, 2 * right + 1], axis=1).reshape(-1)
    res = solve_plane_transient_plastic(
        p, sigma_y=12.0, hardening_iso=20.0, n_steps=200,
        damping=(0.5, 0.0), record_every=20, probe_dofs=probe)
    assert out["dt"] == pytest.approx(res.dt)
    np.testing.assert_allclose(np.asarray(out["displacements"]),
                               res.displacements, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out["plastic_work"]),
                               res.plastic_work, rtol=1e-12)
    assert len(out["yielded_elements"]) == p.nelm  # step load yields all
    assert out["von_mises_envelope"][0] > 12.0
    assert len(out["final"]["eq_plastic_strain"]) == p.nelm


def test_json_solid_transient_plastic():
    from pinn_fem_tpu.io.solid_io import run_solid_document
    from pinn_fem_tpu.models.solid import solid_stable_dt

    # explicit HALF the stable step: the energy-books assertion needs
    # it (the O(dt) half-step work/dissipation error during the first
    # plastic excursion is ~11% at the stability limit, measured);
    # the plane JSON test exercises the dt="auto" default.
    dt = 0.5 * solid_stable_dt(solid_bar(nz=2))
    doc = {
        "element_type": "solid",
        "mesh": {"type": "box", "lx": 1.0, "ly": 1.0, "lz": 4.0,
                 "nx": 1, "ny": 1, "nz": 2},
        "material": {"young": E, "poisson": NU, "density": RHO},
        "fixed_z_nodes": "z_min", "fixed_x_nodes": "x_min",
        "fixed_y_nodes": "y_min",
        "surface_loads": [{"face": "z_max",
                           "traction": [0.0, 0.0, 1.6 * Q]}],
        # no damping: Rayleigh dissipation is (correctly) absent
        # from the KE+SE+Wp ledger, so books only close undamped
        "analysis": {"type": "transient", "dt": dt,
                     "n_steps": 400, "record_every": 40,
                     "probe_nodes": "z_max",
                     "plasticity": {"sigma_y": 12.0,
                                    "hardening": 20.0}},
    }
    out = run_solid_document(doc)
    assert out["success"] is True and out["plastic"] is True
    assert out["element_type"] == "solid"
    assert out["plastic_work"][-1] > 0.0
    assert max(out["von_mises_envelope"]) > 12.0
    # energy books close in the serialized payload too
    w = np.asarray(out["external_work"])
    e = (np.asarray(out["kinetic_energy"])
         + np.asarray(out["strain_energy"])
         + np.asarray(out["plastic_work"]))
    np.testing.assert_allclose(e, w, atol=0.03 * np.abs(w).max())


def test_json_transient_plastic_guards():
    from pinn_fem_tpu.io.plane_io import run_plane_document
    from pinn_fem_tpu.io.solid_io import run_solid_document

    with pytest.raises(ValueError, match="sigma_y"):
        run_plane_document(plane_doc(plasticity={"hardening": 1.0}))
    # unbounded payload: no probes on a history that big
    big = plane_doc(record_every=1, n_steps=3000)
    del big["analysis"]["probe_nodes"]
    with pytest.raises(ValueError, match="probe"):
        run_plane_document(big)
    with pytest.raises(ValueError, match="banded"):
        run_solid_document({
            "element_type": "solid",
            "mesh": {"type": "box", "lx": 1, "ly": 1, "lz": 2,
                     "nx": 1, "ny": 1, "nz": 2},
            "material": {"young": E, "poisson": NU, "density": RHO},
            "fixed_nodes": "z_min",
            "analysis": {"type": "transient", "n_steps": 10,
                         "banded": True,
                         "plasticity": {"sigma_y": 1.0}}})


def test_element_parallel_mesh_matches_single_device():
    """mesh= element-parallel SPMD (GSPMD constraints on the Gauss-
    point batch): the 8-device run equals the unsharded device run
    bit-for-bit-in-f32-tolerance, and the host f64 mirror bound
    holds — the dryrun_multichip proof, pinned in the suite."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (conftest)")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("dp",))
    p = strip("quad", nx=8, ny=2)             # 16 elements: 8 | 16
    n = 240
    amp = np.concatenate([np.linspace(0.0, 1.8, 120), np.zeros(120)])
    kw = dict(sigma_y=12.0, hardening_iso=20.0, n_steps=n,
              amplitude=amp, damping=(0.5, 0.0), record_every=20,
              probe_dofs=[2, 3])
    d1 = solve_plane_transient_plastic(p, host=False, **kw)
    dn = solve_plane_transient_plastic(p, mesh=mesh, **kw)
    np.testing.assert_allclose(dn.displacements, d1.displacements,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(dn.plastic_work, d1.plastic_work,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(dn.von_mises_envelope,
                               d1.von_mises_envelope, rtol=1e-4)
    h = solve_plane_transient_plastic(p, host=True, **kw)
    scale = np.abs(h.displacements).max()
    np.testing.assert_allclose(dn.displacements, h.displacements,
                               atol=5e-4 * scale)
    # indivisible element count refused loudly
    with pytest.raises(ValueError, match="divisible"):
        solve_plane_transient_plastic(strip("quad", nx=3, ny=1),
                                      mesh=mesh, **kw)
    with pytest.raises(ValueError, match="host"):
        solve_plane_transient_plastic(p, mesh=mesh, host=True, **kw)
