#!/usr/bin/env python3
"""Scaling benchmarks beyond the reference corpus.

Timing methodology (this matters on a remote-attached TPU):
  * results are synchronized by fetching a scalar from the output —
    block_until_ready alone does not reliably synchronize through the
    attachment tunnel;
  * the tunnel has a ~30 ms response-latency floor, so per-op costs are
    measured by CHAINING many dependent applications inside one program
    and subtracting the floor.

Measurements:
  1. K @ u at 1M elements, gather-based vs banded-DIA operator;
  2. full banded-PCG Newton solve on a braced tower (~40k DOFs);
  3. dp-batched Newton-Raphson throughput (problems/second).

Prints one JSON line per measurement.  Run: python benchmarks/scaling.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pinn_fem_tpu import Material, SolverConfig, TrussProblem, solve_nr
from pinn_fem_tpu.ops.cg import apply_stiffness, stiffness_coefficients
from pinn_fem_tpu.ops.dia import assemble_dia, dia_layout, dia_matvec
from pinn_fem_tpu.parallel.batched import solve_nr_batched

CHAIN_REPS = 100


def sync(x) -> float:
    """Force device completion + fetch (see module docstring)."""
    return float(jnp.ravel(x)[0])


def grid_problem(rows, cols):
    """Cross-braced grid strip in tension: the whole left edge is fixed and
    the right edge is pulled axially — realistically conditioned for
    Jacobi-PCG (unlike a cantilever, whose bending modes have cond ~ n^4)."""
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
    nnode = rows * cols
    loads = np.zeros(2 * nnode)
    fixed = []
    for r in range(rows):
        fixed += [2 * nid(r, 0), 2 * nid(r, 0) + 1]      # left edge pinned
        loads[2 * nid(r, cols - 1)] = 1.0                 # right edge pulled
    return TrussProblem(
        nodes=nodes, elements=np.array(elements),
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array(fixed), dimension=2,
    )


def chain_problem(n_nodes):
    nodes = np.stack([np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], 1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    loads = np.zeros(2 * n_nodes)
    loads[-2] = 1.0
    return TrussProblem(
        nodes=nodes, elements=elements,
        material=Material(young=1.0, area=1.0, density=1.0),
        loads=loads, fixed_dofs=np.array([0, 1]), dimension=2,
    )


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 6),
                      "unit": unit, **extra}), flush=True)


def timed(fn, reps=5):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    backend = jax.default_backend()

    # Latency floor of the attachment (subtracted from chained timings).
    probe = jnp.ones(1024)
    double = jax.jit(lambda x: x * 2.0)
    floor = timed(lambda: double(probe))
    emit("sync_latency_floor", floor * 1e3, "ms", backend=backend)

    # 1) K @ u at 1M elements: gather vs DIA, chained.
    n = 1_000_001
    p = chain_problem(n)
    data = p.to_device()
    s = stiffness_coefficients(data, p.material, 1.0)
    u = jnp.asarray(np.random.default_rng(0).normal(size=p.ndof), jnp.float32)

    @jax.jit
    def chained_gather(data, s, u):
        return jax.lax.fori_loop(
            0, CHAIN_REPS, lambda _, v: apply_stiffness(data, s, v) * 0.25, u)

    t = (timed(lambda: chained_gather(data, s, u), reps=3) - floor) / CHAIN_REPS
    emit("Ku_gather", t * 1e3, "ms", elements=n - 1, backend=backend)

    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    diags = jax.jit(lambda s, g: assemble_dia(layout, s, g))(s, data.gvec)

    @jax.jit
    def chained_dia(d, u):
        return jax.lax.fori_loop(
            0, CHAIN_REPS, lambda _, v: dia_matvec(layout, d, v) * 0.25, u)

    t_dia = (timed(lambda: chained_dia(diags, u), reps=3) - floor) / CHAIN_REPS
    emit("Ku_dia", t_dia * 1e3, "ms", elements=n - 1, backend=backend,
         n_diags=layout.n_diags, speedup_vs_gather=round(t / t_dia, 1))

    if backend == "tpu":
        from pinn_fem_tpu.ops.pallas.dia_kernel import (
            dia_matvec_packed,
            pack_dia_interleaved,
        )

        # Pack once per solve (as dia_cg_solve does), then stream the
        # interleaved layout from every matvec.  PackedDia's geometry
        # fields are trace-time constants, so packing lives inside the jit.
        # The kernel is ~10x faster than the XLA chain, so it needs a much
        # longer chain for the ~±2 ms noise on the latency floor to wash out.
        PALLAS_REPS = 1000

        @jax.jit
        def chained_pallas(d, u):
            packed = pack_dia_interleaved(layout, d)
            return jax.lax.fori_loop(
                0, PALLAS_REPS,
                lambda _, v: dia_matvec_packed(layout, packed, v) * 0.25, u)

        t_pk = (timed(lambda: chained_pallas(diags, u), reps=3) - floor) / PALLAS_REPS
        emit("Ku_dia_pallas", t_pk * 1e3, "ms", elements=n - 1,
             backend=backend, speedup_vs_xla_slicing=round(t_dia / t_pk, 2))

        # 1b) Whole-PCG-iteration cost at 2M DOFs: the fused two-kernel
        # iteration (ops/pallas/cg_kernel.py) vs the ~14-op XLA form.
        # tol=0 pins both to exactly CG_REPS iterations (same recurrence).
        from pinn_fem_tpu.ops.dia import dia_cg_solve
        from pinn_fem_tpu.ops.pallas.cg_kernel import fused_cg_solve

        CG_REPS = 300
        mask = jnp.ones(p.ndof, jnp.float32).at[jnp.asarray([0])].set(0.0)
        mask = mask.at[jnp.arange(1, p.ndof, 2)].set(0.0)  # pin y + root
        rhs = jnp.zeros(p.ndof, jnp.float32).at[-2].set(1.0)

        xla_cg = jax.jit(lambda d, b, m: dia_cg_solve(
            layout, d, b, m, tol=0.0, max_iter=CG_REPS, use_pallas=False))
        t_x = (timed(lambda: xla_cg(diags, rhs, mask)[0], reps=3)
               - floor) / CG_REPS
        fus_cg = jax.jit(lambda d, b, m: fused_cg_solve(
            layout, d, b, m, tol=0.0, max_iter=CG_REPS))
        t_f = (timed(lambda: fus_cg(diags, rhs, mask)[0], reps=3)
               - floor) / CG_REPS
        emit("cg_iteration_xla", t_x * 1e3, "ms", dofs=p.ndof,
             backend=backend)
        emit("cg_iteration_fused", t_f * 1e3, "ms", dofs=p.ndof,
             backend=backend, speedup_vs_xla=round(t_x / t_f, 2))

    # 2) Banded-PCG Newton solve, cross-braced grid (40k DOFs, aspect 2 —
    # float32 Jacobi-PCG stalls on high-aspect strips; see TECHNICAL_README).
    rows, cols = 100, 200
    p = grid_problem(rows, cols)
    t0 = time.perf_counter()
    result = solve_nr(p, SolverConfig(max_iterations=20, tolerance=1e-5), 1.0,
                      linear_solver="cg-dia")
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    p2 = grid_problem(rows, cols)
    result = solve_nr(p2, SolverConfig(max_iterations=20, tolerance=1e-5), 1.0,
                      linear_solver="cg-dia")
    t_warm = time.perf_counter() - t0
    emit("grid_nr_dia_solve", t_warm, "s", dofs=p.ndof, elements=p.nelm,
         converged=bool(result.converged), first_call_s=round(t_first, 1),
         backend=backend)

    # 2a) OC compliance sizing on the same 40k-DOF grid: per-iteration
    # cost of the large-mesh design loop (one banded PCG solve + Λ
    # bisection per iteration, all one jitted program, warm-started).
    # Measured differentially — t(12) - t(2) over 10 iterations — so
    # the shared compile/attach cost cancels.
    from pinn_fem_tpu.solvers.sizing import optimize_compliance_oc

    lengths = np.linalg.norm(
        p.nodes[p.elements[:, 1]] - p.nodes[p.elements[:, 0]], axis=1)
    vol = float(np.sum(lengths))
    optimize_compliance_oc(p, vol, n_iter=2, min_area=1e-4)   # warm
    t0 = time.perf_counter()
    optimize_compliance_oc(p, vol, n_iter=2, min_area=1e-4)
    t_2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    res_oc = optimize_compliance_oc(p, vol, n_iter=12, min_area=1e-4)
    t_12 = time.perf_counter() - t0
    emit("oc_sizing_iteration", (t_12 - t_2) / 10.0 * 1e3, "ms",
         dofs=p.ndof, elements=p.nelm, backend=backend,
         compliance_drop_12it=round(
             float(res_oc.history[0] / res_oc.history[-1]), 2))

    # 2b) Explicit transient dynamics at 2M DOFs: whole time history as
    # one lax.scan; each step is one banded matvec (Pallas on TPU) plus
    # pointwise updates, so the MARGINAL step cost should sit at the
    # matvec streaming bound.  Measured DIFFERENTIALLY — t(N) - t(N/10)
    # over the extra steps — so the fixed per-call cost (eager setup +
    # fetching the (2, ndof) final state through the ~30 ms tunnel) does
    # not pollute the per-step number; the fixed cost is reported too.
    from pinn_fem_tpu.solvers.dynamics import solve_transient, stable_dt

    p = chain_problem(1_000_001)
    data = p.to_device()
    dt = stable_dt(p, data)
    n_long, n_short = 20_000, 2_000

    def run(n):
        return solve_transient(
            p, dt=dt, n_steps=n, method="central",
            record_every=n, probe_dofs=np.array([p.ndof - 2]),
            data=data).u_final

    t_first0 = time.perf_counter()
    run(n_long)
    run(n_short)  # compile both lengths
    t_first = time.perf_counter() - t_first0

    def med(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_long, t_short = med(n_long), med(n_short)
    t_step = (t_long - t_short) / (n_long - n_short)
    emit("transient_central_step", t_step * 1e3, "ms", dofs=p.ndof,
         steps=n_long, dt=round(float(dt), 6), backend=backend,
         first_call_s=round(t_first, 1), steps_per_s=round(1.0 / t_step),
         fixed_call_overhead_ms=round(
             (t_short - t_step * n_short) * 1e3, 1))

    # 2c) Harmonic frequency sweep: the dense direct path vmaps the whole
    # sweep into one batched real-block solve — n_freq (2n x 2n)
    # factorizations as a single MXU batch instead of a host loop.
    from pinn_fem_tpu.solvers.harmonic import harmonic_response

    p = grid_problem(16, 16)  # 512 DOFs -> 1024x1024 blocks
    n_freq = 256
    om = np.linspace(0.05, 2.0, n_freq)

    def sweep():
        # host=False: this row measures the DEVICE block-solve batch
        # (the description below); without it the post-round-3 host
        # tier would serve a 512-DOF problem from numpy and the number
        # would measure the wrong path.
        return harmonic_response(p, om, damping=(0.05, 0.002),
                                 probe_dofs=np.array([p.ndof - 2]),
                                 host=False)

    t0 = time.perf_counter()
    sweep()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sweep()
        ts.append(time.perf_counter() - t0)
    t_sweep = float(np.median(ts)) - floor
    emit("harmonic_sweep", t_sweep, "s", dofs=p.ndof, n_freq=n_freq,
         backend=backend, freqs_per_s=round(n_freq / t_sweep),
         first_call_s=round(t_first, 1))

    # 3) Batched NR throughput on the benchmark mesh.
    p = chain_problem(4)
    batch = 256
    scales = np.linspace(0.1, 2.0, batch)
    loads_b = scales[:, None] * p.loads[None, :]
    t = timed(lambda: solve_nr_batched(p, loads_b, SolverConfig())["u"], reps=5)
    emit("batched_nr_throughput", batch / t, "problems/s", batch=batch,
         backend=backend)

    plane_section(backend)
    frame_section(backend)
    solid_section(backend)


def plane_section(backend):
    """4) Large-mesh plane continuum statics through the banded device
    tier (models/plane.solve_plane_static_banded): Q4 grid in
    uniaxial tension, gated against the closed form.  The second
    problem (same shape class, different material) measures the
    signature-keyed program cache — its first call must not pay a
    recompile.  Runnable alone: python benchmarks/scaling.py plane"""
    from pinn_fem_tpu.models.plane import (
        PlaneProblem,
        edge_load,
        rect_mesh,
        solve_plane_static_banded,
    )

    # x is the fast node-numbering direction (rect_mesh), so the SHORT
    # side goes on x to keep the DIA bandwidth at 2(nx+2) = 260 DOFs
    # (the tall orientation would be 1026 and blow the Pallas halo).
    nx, ny = 128, 512
    w, h, q, E, T = 1.0, 4.0, 10.0, 1000.0, 0.1
    nodes, elems = rect_mesh(w, h, nx, ny, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    fixed = np.concatenate([2 * left, 2 * bottom + 1])
    right = np.flatnonzero(nodes[:, 0] == w)
    order = right[np.argsort(nodes[right, 1])]
    loads = edge_load(nodes, order, [q, 0.0], T)

    def plane_problem(young):
        return PlaneProblem(nodes=nodes, elements=elems, young=young,
                            poisson=0.3, thickness=T, density=1.0,
                            loads=loads, fixed_dofs=fixed)

    p1 = plane_problem(E)
    t0 = time.perf_counter()
    res, iters, rel = solve_plane_static_banded(p1, tol=1e-7)
    t_first = time.perf_counter() - t0
    ux = res.displacements[0::2]
    err = float(np.max(np.abs(ux - q * nodes[:, 0] / E))) / (q * w / E)
    assert err < 2e-3 and rel < 1e-6, (err, rel)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_plane_static_banded(p1, tol=1e-7)
        ts.append(time.perf_counter() - t0)
    emit("plane_static_banded", float(np.median(ts)), "s",
         dofs=p1.ndof, elements=elems.shape[0], iterations=int(iters),
         rel_residual=float(rel), closed_form_err=round(err, 6),
         first_call_s=round(t_first, 1), backend=backend)

    if backend == "tpu":
        # Fused two-Pallas-kernel CG on the same problem/gate.
        solve_plane_static_banded(p1, tol=1e-7, use_pallas=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res_p, it_p, rel_p = solve_plane_static_banded(
                p1, tol=1e-7, use_pallas=True)
            ts.append(time.perf_counter() - t0)
        err_p = float(np.max(np.abs(res_p.displacements[0::2]
                                    - q * nodes[:, 0] / E))) / (q * w / E)
        assert err_p < 2e-3, err_p
        emit("plane_static_banded_pallas", float(np.median(ts)), "s",
             dofs=p1.ndof, iterations=int(it_p),
             closed_form_err=round(err_p, 6), backend=backend)

    p2 = plane_problem(2.0 * E)
    t0 = time.perf_counter()
    res2, _, _ = solve_plane_static_banded(p2, tol=1e-7)
    t_reuse = time.perf_counter() - t0
    err2 = float(np.max(np.abs(res2.displacements[0::2]
                               - q * nodes[:, 0] / (2.0 * E)))) \
        / (q * w / (2.0 * E))
    assert err2 < 2e-3, err2
    emit("plane_static_banded_program_reuse", t_reuse, "s",
         dofs=p2.ndof, backend=backend,
         note="first call on a NEW problem of the same shape class; "
              "a recompile here would cost minutes on this box")


def frame_section(backend):
    """5) Large-mesh FRAME statics + modal through the banded device
    tier (models/frame.solve_frame_static_banded /
    frame_modal_banded, round-4 VERDICT #2): a 50-story, 260-bay
    story-grid (~40k DOFs) under triangular lateral wind load.

    Node numbering runs STORY-fastest (51 nodes) so the DIA bandwidth
    stays at 3*(stories+2) ~ 160 DOFs regardless of plan width — the
    same short-axis rule the plane grid uses.  Gates: global
    equilibrium (base shear == applied lateral load, which a wrong
    matvec/scatter cannot fake) and banded-vs-dense agreement on a
    coarse instance of the same generator.  Runnable alone:
    python benchmarks/scaling.py frame"""
    from pinn_fem_tpu.models.frame import (
        FrameProblem,
        frame_modal_banded,
        solve_frame_static,
        solve_frame_static_banded,
    )

    def tower(ns, nb, h=3.0, w=5.0):
        ny, nx = ns + 1, nb + 1

        def nid(i, j):                 # i = story (fast), j = bay
            return j * ny + i

        nodes = np.array([[j * w, i * h] for j in range(nx)
                          for i in range(ny)])
        elems = []
        for j in range(nx):
            for i in range(ns):
                elems.append([nid(i, j), nid(i + 1, j)])
        for j in range(nb):
            for i in range(1, ny):
                elems.append([nid(i, j), nid(i, j + 1)])
        loads = np.zeros(3 * len(nodes))
        for i in range(1, ny):          # triangular wind on face j=0
            loads[3 * nid(i, 0)] = 1000.0 * i
        fixed = np.concatenate([[3 * nid(0, j), 3 * nid(0, j) + 1,
                                 3 * nid(0, j) + 2]
                                for j in range(nx)])
        return FrameProblem(nodes=nodes, elements=np.asarray(elems),
                            young=200e9, area=0.01, inertia=1e-4,
                            density=7850.0, loads=loads,
                            fixed_dofs=fixed)

    # Coarse correctness gate: banded == dense on the same generator.
    pc = tower(8, 4)
    dense = solve_frame_static(pc)
    bc, _, _ = solve_frame_static_banded(pc, tol=1e-8)
    scale = np.abs(dense.displacements).max()
    gate = float(np.abs(bc.displacements - dense.displacements).max()
                 / scale)
    assert gate < 2e-3, gate

    p = tower(50, 260)                  # 39,933 DOFs
    t0 = time.perf_counter()
    res, iters, rel = solve_frame_static_banded(p, tol=1e-7)
    t_first = time.perf_counter() - t0
    shear = -float(res.reactions[0::3].sum())
    applied = float(p.loads[0::3].sum())
    eq_err = abs(shear - applied) / applied
    # f32 CG at rel ~1e-7 leaves conditioning-amplified reaction error
    # (~0.4% measured at 40k DOFs); the gate is physics-level.
    assert eq_err < 1e-2 and rel < 1e-6, (eq_err, rel)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_frame_static_banded(p, tol=1e-7)
        ts.append(time.perf_counter() - t0)
    emit("frame_static_banded", float(np.median(ts)), "s",
         dofs=p.ndof, elements=p.nelm, iterations=int(iters),
         rel_residual=float(rel), equilibrium_err=round(eq_err, 8),
         coarse_vs_dense=round(gate, 6),
         first_call_s=round(t_first, 1), backend=backend)

    t0 = time.perf_counter()
    mb = frame_modal_banded(p, n_modes=4, n_iter=20, cg_tol=1e-7)
    t_modal = time.perf_counter() - t0
    f = mb.frequencies_hz
    assert np.all(f > 0) and np.all(np.diff(f) > 0), f
    emit("frame_modal_banded", t_modal, "s", dofs=p.ndof, n_modes=4,
         f1_hz=round(float(f[0]), 4), backend=backend)


def frame3d_section(backend, stories=50, nx=4, ny=32):
    """5b) Large-mesh SPACE-FRAME statics + modal through the banded
    device tier (models/frame3d.solve_space_frame_static_banded /
    space_frame_modal_banded): a 50-story 3D building skeleton
    (4 x 32 column grid, beams both plan directions, ~40k DOFs)
    under per-story face wind.

    Node numbering runs STORY-fastest so the stiffness keeps a few
    dozen DISTINCT diagonals (DIA cost scales with diagonal count,
    not offset magnitude) and the CG conditioning is set by the story
    count — the same regime as the 2D frame grid row.  Gates: global
    equilibrium (base shear == applied wind, which a wrong
    matvec/scatter cannot fake) and banded-vs-dense agreement on a
    coarse instance of the same generator.  Runnable alone:
    python benchmarks/scaling.py frame3d"""
    from pinn_fem_tpu.models.frame3d import (
        SpaceFrameProblem,
        solve_space_frame_static,
        solve_space_frame_static_banded,
        space_frame_modal_banded,
    )

    def grid3d(ns, gx, gy, h=3.0, w=5.0):
        nzn = ns + 1

        def nid(i, j, k):              # i = story (fast axis)
            return i + nzn * (j + gx * k)

        nodes = np.zeros((nzn * gx * gy, 3))
        for k in range(gy):
            for j in range(gx):
                for i in range(nzn):
                    nodes[nid(i, j, k)] = (j * w, k * w, i * h)
        elems = []
        for k in range(gy):
            for j in range(gx):
                for i in range(ns):    # columns
                    elems.append([nid(i, j, k), nid(i + 1, j, k)])
        for k in range(gy):
            for j in range(gx - 1):    # x-beams per story
                for i in range(1, nzn):
                    elems.append([nid(i, j, k), nid(i, j + 1, k)])
        for k in range(gy - 1):        # y-beams per story
            for j in range(gx):
                for i in range(1, nzn):
                    elems.append([nid(i, j, k), nid(i, j, k + 1)])
        loads = np.zeros(6 * len(nodes))
        for j in range(gx):            # face wind (y) on face k=0
            for i in range(1, nzn):
                loads[6 * nid(i, j, 0) + 1] = 500.0
        base = np.array([nid(0, j, k) for k in range(gy)
                         for j in range(gx)])
        fixed = (6 * base[:, None] + np.arange(6)[None, :]).reshape(-1)
        return SpaceFrameProblem(
            nodes=nodes, elements=np.asarray(elems), young=200e9,
            area=0.01, inertia_y=1e-4, inertia_z=1e-4, torsion_j=2e-4,
            density=7850.0, loads=loads, fixed_dofs=fixed,
            shear_modulus=80e9)

    # Coarse correctness gate: banded == dense on the same generator.
    pc = grid3d(6, 2, 3)
    dense = solve_space_frame_static(pc)
    bc, _, _ = solve_space_frame_static_banded(pc, tol=1e-8)
    scale = np.abs(dense.displacements).max()
    gate = float(np.abs(bc.displacements - dense.displacements).max()
                 / scale)
    assert gate < 2e-3, gate

    p = grid3d(stories, nx, ny)        # 39,168 DOFs at 50 x 4 x 32
    t0 = time.perf_counter()
    res, iters, rel = solve_space_frame_static_banded(p, tol=1e-7)
    t_first = time.perf_counter() - t0
    shear = -float(res.reactions[1::6].sum())     # wind acts in +y
    applied = float(p.loads[1::6].sum())
    eq_err = abs(shear - applied) / applied
    assert eq_err < 1e-2 and rel < 1e-6, (eq_err, rel)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_space_frame_static_banded(p, tol=1e-7)
        ts.append(time.perf_counter() - t0)
    emit("frame3d_static_banded", float(np.median(ts)), "s",
         dofs=p.ndof, elements=p.nelm, iterations=int(iters),
         rel_residual=float(rel), equilibrium_err=round(eq_err, 8),
         coarse_vs_dense=round(gate, 6),
         first_call_s=round(t_first, 1), backend=backend)

    t0 = time.perf_counter()
    mb = space_frame_modal_banded(p, n_modes=4, n_iter=20,
                                  cg_tol=1e-7)
    t_modal = time.perf_counter() - t0
    f = mb.frequencies_hz
    assert np.all(f > 0) and np.all(np.diff(f) >= 0), f
    emit("frame3d_modal_banded", t_modal, "s", dofs=p.ndof, n_modes=4,
         f1_hz=round(float(f[0]), 6), backend=backend)


def solid_section(backend):
    """6) Large-mesh 3D SOLID statics through the banded device tier
    (models/solid.solve_solid_static_banded): a 16x16x96 hex8 column
    (84k DOFs, 24.6k bricks) in uniaxial tension with symmetry
    supports, gated against the EXACT homogeneous closed form
    u_z = sigma z / E (linear in z at every node).  The short sides go
    on x/y (node numbering is x-fastest) so the DIA bandwidth stays at
    3((nx+1)(ny+1) + nx + 2) + 2 ~ 920 regardless of column height —
    the same short-axis rule the plane/frame grids use; the 3D stencil
    has ~135 distinct diagonals (27 node neighbours x 5 DOF offsets).
    Runnable alone: python benchmarks/scaling.py solid"""
    from pinn_fem_tpu.models.solid import (
        SolidProblem,
        boundary_quads,
        box_mesh,
        solve_solid_static_banded,
        surface_load,
    )

    nx, ny, nz = 16, 16, 96
    E, sigma, L = 200.0, 5.0, 4.0
    nodes, elems = box_mesh(1.0, 1.0, L, nx, ny, nz)
    n = nodes.shape[0]
    bot = np.flatnonzero(np.abs(nodes[:, 2]) < 1e-12)
    x0 = np.flatnonzero(np.abs(nodes[:, 0]) < 1e-12)
    y0 = np.flatnonzero(np.abs(nodes[:, 1]) < 1e-12)
    fixed = np.concatenate([3 * bot + 2, 3 * x0, 3 * y0 + 1])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=0.3,
                     density=2.0, loads=np.zeros(3 * n),
                     fixed_dofs=fixed)
    loads = surface_load(nodes, boundary_quads(p, 2, +1),
                         [0.0, 0.0, sigma])
    p = SolidProblem(nodes=nodes, elements=elems, young=E, poisson=0.3,
                     density=2.0, loads=loads, fixed_dofs=fixed)

    t0 = time.perf_counter()
    res, iters, rel = solve_solid_static_banded(p, tol=1e-8)
    t_first = time.perf_counter() - t0
    uz = res.displacements[2::3]
    err = float(np.max(np.abs(uz - sigma * nodes[:, 2] / E))) \
        / (sigma * L / E)
    assert err < 2e-3 and rel < 1e-6, (err, rel)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_solid_static_banded(p, tol=1e-8)
        ts.append(time.perf_counter() - t0)
    emit("solid_static_banded", float(np.median(ts)), "s",
         dofs=p.ndof, elements=elems.shape[0], iterations=int(iters),
         rel_residual=float(rel), closed_form_err=round(err, 8),
         first_call_s=round(t_first, 1), backend=backend)

def plastic_section(backend):
    """7) Explicit elastoplastic transient on the plane continuum
    device tier (solvers/continuum_transient_plastic): a 128x32 Q4
    strip (4096 elements, 16384 Gauss points, 8.4k DOFs) ramped past
    yield — one jitted lax.scan committing the J2 radial return every
    step.  Reports ms/step (the dominant cost is the two Gauss-point
    einsum batches per step: B eps and B^T sigma, MXU-shaped
    (m, gp, 3, 8)).  Correctness gates: dissipation is positive and
    monotone, the von Mises envelope crossed yield, and the final
    mean eq-plastic strain sits in the bilinear band.
    Runnable alone: python benchmarks/scaling.py plastic"""
    from pinn_fem_tpu.models.plane import PlaneProblem, edge_load, rect_mesh
    from pinn_fem_tpu.solvers.continuum_transient_plastic import (
        solve_plane_transient_plastic,
    )

    W, H, E = 16.0, 4.0, 200.0
    nodes, elems = rect_mesh(W, H, 128, 32, "quad")
    left = np.flatnonzero(nodes[:, 0] == 0.0)
    bottom = np.flatnonzero(nodes[:, 1] == 0.0)
    right = np.flatnonzero(nodes[:, 0] == W)
    loads = edge_load(nodes, right[np.argsort(nodes[right, 1])],
                      [16.0, 0.0], 0.5)
    p = PlaneProblem(nodes=nodes, elements=elems, young=E, poisson=0.3,
                     thickness=0.5, density=2.0, loads=loads,
                     fixed_dofs=np.concatenate([2 * left,
                                                2 * bottom + 1]))
    n_steps = 400
    amp = np.concatenate([np.linspace(0.0, 1.0, 200), np.ones(200)])
    kw = dict(sigma_y=12.0, hardening_iso=20.0, n_steps=n_steps,
              amplitude=amp, record_every=n_steps,
              probe_dofs=np.array([2 * int(right[0])]), host=False)
    t0 = time.perf_counter()
    res = solve_plane_transient_plastic(p, **kw)
    t_first = time.perf_counter() - t0
    wp = float(res.plastic_work[-1])
    assert wp > 0.0 and np.isfinite(wp), wp
    assert float(res.von_mises_envelope.max()) > 12.0
    alpha = float(res.final_eq_plastic.mean())
    assert 0.0 < alpha < 0.5, alpha
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solve_plane_transient_plastic(p, **kw)
        ts.append(time.perf_counter() - t0)
    emit("plane_plastic_transient_step",
         float(np.median(ts)) / n_steps * 1e3, "ms/step",
         dofs=p.ndof, elements=elems.shape[0],
         gauss_points=4 * elems.shape[0], n_steps=n_steps,
         plastic_work=round(wp, 4), mean_eq_plastic=round(alpha, 5),
         first_call_s=round(t_first, 1), backend=backend)


def shellnl_section(backend, nx=16, ny=512):
    """8) Large-mesh GEOMETRICALLY NONLINEAR shell statics through the
    banded Marguerre tier (solvers/shell_nonlinear.
    solve_shell_nonlinear_banded): the ODE-anchored von Karman strip
    (immovable pinned edges, nu = 0 -> cylindrical bending IS the
    beam) extruded ny elements long — at the calibrated pressure the
    midspan deflection is w/t = 1.04 where the LINEAR answer would be
    3x larger, and the exact beam solution (cosh closed form + the
    scalar membrane-force fixpoint, tests/test_shell_nonlinear.py) is
    the correctness gate.  The span is the fast numbering axis so the
    DIA bandwidth stays 6*(nx+3) DOFs.  Runnable alone:
    python benchmarks/scaling.py shellnl"""
    import time as _time

    from scipy.optimize import brentq

    from pinn_fem_tpu.models.shell import ShellProblem
    from pinn_fem_tpu.solvers.shell_nonlinear import \
        solve_shell_nonlinear_banded

    span, E, T = 4.0, 2e5, 0.1
    D = E * T**3 / 12.0
    q = 3.0 * 0.15 * 384.0 * D / (5.0 * span**4)
    xs = np.linspace(0.0, span, nx + 1)
    ys = np.arange(ny + 1, dtype=float)
    nodes = np.array([[x, y, 0.0] for y in ys for x in xs])
    na = nx + 1
    elems = np.asarray([[j * na + i, j * na + i + 1,
                         j * na + i + 1 + na, j * na + i + na]
                        for j in range(ny) for i in range(nx)])
    n = nodes.shape[0]
    fixed = []
    for nd in range(n):
        if nodes[nd, 0] in (0.0, span):
            fixed += [6 * nd + 0, 6 * nd + 1, 6 * nd + 2]
        fixed.append(6 * nd + 3)          # cylindrical (theta_x)
    p = ShellProblem(nodes=nodes, elements=elems, young=E,
                     poisson=0.0, thickness=T, density=1.0,
                     loads=np.zeros(6 * n),
                     fixed_dofs=np.array(sorted(set(fixed))),
                     pressure=-q)
    lfs = np.array([0.25, 0.5, 0.75, 1.0])

    t0 = _time.perf_counter()
    r = solve_shell_nonlinear_banded(p, load_factors=lfs)
    t_first = _time.perf_counter() - t0          # includes compiles
    t0 = _time.perf_counter()
    r = solve_shell_nonlinear_banded(p, load_factors=lfs)
    t_warm = _time.perf_counter() - t0
    n_newton = int(r.iterations.sum())
    assert r.converged, "banded Marguerre did not converge"

    # Exact von Karman beam gate (the test-anchored closed form).
    def resid(nf):
        kk = np.sqrt(nf / D)
        c = np.cosh(kk * span / 2.0)
        xg = np.linspace(-span / 2.0, span / 2.0, 4001)
        wp = (q / nf) * (np.sinh(kk * xg) / (kk * c) - xg)
        return nf - E * T / (2.0 * span) * np.trapezoid(wp**2, xg)

    nf = brentq(resid, 1e-3, 5e3, xtol=1e-12)
    kk = np.sqrt(nf / D)
    c = np.cosh(kk * span / 2.0)
    w_ex = abs((q / nf) * ((1.0 - c) / (kk**2 * c) + span**2 / 8.0))
    mid = 6 * (ny // 2 * na + nx // 2) + 2
    w_fe = abs(r.displacements[-1][mid])
    assert abs(w_fe - w_ex) / w_ex < 3e-3, (w_fe, w_ex)
    w_lin = 5.0 * q * span**4 / (384.0 * D)      # 3x the actual
    emit("shellnl_banded_solve", t_warm, "s", backend=backend,
         ndof=p.ndof, nelm=p.nelm, n_steps=int(lfs.size),
         newton_iterations=n_newton,
         per_newton_iteration_ms=round(1e3 * t_warm
                                       / max(n_newton, 1), 3),
         first_call_s=round(t_first, 3),
         w_over_t=round(w_fe / T, 3),
         stiffening_vs_linear=round(w_fe / w_lin, 4),
         vs_exact_ode=round(abs(w_fe - w_ex) / w_ex, 6),
         max_residual=float(r.residuals.max()))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "plane":
        plane_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "frame":
        frame_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "frame3d":
        frame3d_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "solid":
        solid_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "plastic":
        plastic_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "shellnl":
        shellnl_section(jax.default_backend())
    elif len(sys.argv) > 1 and sys.argv[1] == "shellnl-small":
        shellnl_section(jax.default_backend(), nx=16, ny=64)
    else:
        main()
