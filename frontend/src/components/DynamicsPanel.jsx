// Dynamics panel: modal / buckling / transient / harmonic / random /
// reduction analyses over the same problem JSON (the "analysis" block
// contract, pinn_fem_tpu/io/analysis.py), POSTed to /api/fem/<kind>.
// Mirrors the zero-dependency UI's dynamics section (serve/static/app.js)
// button-for-button; mode shapes are displayed by handing the selected
// shape to FEMCanvas as the displacement overlay, curves by an inline SVG
// chart (no charting dependency).

import { useState } from 'react';

const COLORS = ['#4ea1ff', '#39c07f', '#e4b34a', '#e46a6a'];

function Chart({ xs, series }) {
  // series: (n_points, n_cols) rows.
  if (!xs || !series || !series.length) return null;
  const W = 420, H = 140, PAD = 6;
  const cols = Math.min(series[0].length, COLORS.length);
  let lo = Infinity, hi = -Infinity;
  for (const row of series) for (const v of row) {
    if (v < lo) lo = v;
    if (v > hi) hi = v;
  }
  if (hi - lo < 1e-12) hi = lo + 1;
  const x = (i) => PAD + (W - 2 * PAD) * i / (xs.length - 1);
  const y = (v) => H - PAD - (H - 2 * PAD) * (v - lo) / (hi - lo);
  const paths = [];
  for (let c = 0; c < cols; c++) {
    paths.push(series.map((row, i) =>
      `${i === 0 ? 'M' : 'L'}${x(i).toFixed(1)},${y(row[c]).toFixed(1)}`
    ).join(''));
  }
  return (
    <svg width={W} height={H} className="dyn-chart">
      <line x1={PAD} y1={y(0)} x2={W - PAD} y2={y(0)} stroke="#2a3342" />
      {paths.map((d, c) => (
        <path key={c} d={d} fill="none" stroke={COLORS[c]} strokeWidth="1.5" />
      ))}
    </svg>
  );
}

export default function DynamicsPanel({ buildProblem, onShowShape }) {
  const [rows, setRows] = useState([]);
  const [kind, setKind] = useState(null);
  const [shapes, setShapes] = useState(null);
  const [chart, setChart] = useState(null);
  const [message, setMessage] = useState('');

  const fail = (e) => {
    // Clear ALL result state: a failed analysis must not leave a stale
    // table or chart from a previous one under the error message.
    setRows([]); setShapes(null); setChart(null);
    setMessage(`Error: ${e.message}`);
  };

  const post = async (which, problem) => {
    const resp = await fetch(`/api/fem/${which}`, {
      method: 'POST',
      headers: { 'Content-Type': 'application/json' },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || `${which} failed`);
    return data.result;
  };

  const baseProblem = () => buildProblem({
    solverType: 'fem', tolerance: 1e-6, maxIterations: 1000,
    preconditioning: false,
  });

  // Probe the loaded nodes (fall back to the last node) — the same
  // heuristic as the static UI (app.js runTransient).
  const probeNodes = (problem) => {
    const loads = problem.loads || [];
    const picked = [];
    for (let i = 0; i * 2 < loads.length; i++) {
      if (loads[2 * i] || loads[2 * i + 1]) picked.push(i);
    }
    if (!picked.length && loads.length) picked.push(loads.length / 2 - 1);
    return picked;
  };

  const run = async (which) => {
    setMessage(`Running ${which} analysis…`);
    try {
      const problem = baseProblem();
      problem.analysis = { n_modes: 4, include_shapes: true };
      const r = await post(which, problem);
      setKind(which);
      setChart(null);
      if (which === 'modal') {
        setShapes(r.mode_shapes ?? null);
        setRows(r.frequencies_hz.map((f, i) => ({
          label: `mode ${i + 1}`,
          value: `${f.toPrecision(5)} Hz (ω=${r.omegas[i].toPrecision(4)})`,
        })));
        setMessage(`Lowest frequency: ${r.frequencies_hz[0].toPrecision(5)} Hz`);
      } else {
        setShapes(r.buckling_modes ?? null);
        setRows(r.load_factors.map((lam, i) => ({
          label: `λ${i + 1}`,
          value: lam === null ? '∞ (no destabilizing mode)' : lam.toPrecision(5),
        })));
        setMessage(r.load_factors[0] === null
          ? 'No destabilizing mode under this load pattern'
          : `Critical load factor: ${r.load_factors[0].toPrecision(5)}`);
      }
    } catch (e) {
      fail(e);
    }
  };

  const runTransient = async () => {
    setMessage('Integrating…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      problem.analysis = {
        type: 'transient', dt: 'auto', n_steps: 4000, record_every: 20,
        damping: [0.05, 0.0], probe_nodes: probes,
        amplitude: { type: 'step' },
      };
      const r = await post('transient', problem);
      setKind('transient'); setRows([]); setShapes(null);
      setChart({ xs: r.times, series: r.displacements });
      setMessage(`Step response: ${r.n_steps} steps `
        + `(dt=${r.dt.toExponential(2)}), probes: nodes ${probes.join(', ')}`);
    } catch (e) {
      fail(e);
    }
  };

  const runQuake = async () => {
    // Seismic demo: sine ground acceleration on every support
    // (base_acceleration load spec, relative coordinates).
    setMessage('Shaking the supports…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      problem.analysis = {
        type: 'transient', dt: 'auto', n_steps: 4000, record_every: 20,
        damping: [0.05, 0.0], probe_nodes: probes,
        load: { type: 'base_acceleration',
                history: { type: 'sine', frequency_hz: 0.05 },
                direction: [1, 0], scale: 1.0 },
      };
      const r = await post('transient', problem);
      setKind('transient'); setRows([]); setShapes(null);
      setChart({ xs: r.times, series: r.displacements });
      setMessage(`Base excitation: ${r.n_steps} steps `
        + `(dt=${r.dt.toExponential(2)}); chart: displacement RELATIVE `
        + `to the ground at nodes ${probes.join(', ')}`);
    } catch (e) {
      fail(e);
    }
  };

  const sweep = async (which) => {
    setMessage(which === 'random'
      ? 'Integrating response PSD…' : 'Sweeping frequencies…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      // Bracket the resonances with a quick modal call (same two-step
      // flow as the static UI).
      const modal = await post('modal', { ...problem,
        analysis: { n_modes: 3, include_shapes: false } });
      const om = modal.omegas;
      const w1 = om[0] || 1, w2 = om[om.length - 1] || 2 * (om[0] || 1);
      // Member fatigue statistics ride the random sweep for free: no
      // S-N constants needed (stress RMS, crossing rate, Davenport
      // 1 h expected peak), bounded to 16 probed elements.
      const nElm = (problem.elements || []).length;
      const probeElements = Array.from(
        { length: Math.min(nElm, 16) }, (_, i) => i);
      problem.analysis = which === 'random'
        ? { type: 'random', psd: 1.0, damping: [0.05, 0.001],
            omegas: { start: 0.2 * w1, stop: 1.5 * w2, num: 400 },
            probe_nodes: probes,
            probe_elements: probeElements,
            fatigue: { duration: 3600.0 } }
        : { type: 'harmonic', damping: [0.05, 0.001],
            omegas: { start: 0.3 * w1, stop: 1.4 * w2, num: 200 },
            probe_nodes: probes };
      const r = await post(which, problem);
      setKind(which); setRows([]); setShapes(null);
      setChart({ xs: r.omegas,
                 series: which === 'random' ? r.psd : r.amplitude });
      let fatigueNote = '';
      if (which === 'random' && r.fatigue) {
        const srms = r.fatigue.stress_rms;
        const worst = srms.indexOf(Math.max(...srms));
        fatigueNote = `; worst member e${r.fatigue.probe_elements[worst]}`
          + `: σ_rms=${srms[worst].toPrecision(3)}, `
          + `ν₀=${r.fatigue.nu0_hz[worst].toPrecision(3)} Hz, `
          + `1 h peak≈${r.fatigue.expected_peak_stress[worst].toPrecision(3)}`;
      }
      setMessage(which === 'random'
        ? `Displacement PSD; RMS = [${r.rms.map((v) => v.toPrecision(4)).join(', ')}]${fatigueNote}`
        : `|H(ω)|; resonances at ${om.map((w) => w.toPrecision(4)).join(', ')}`);
    } catch (e) {
      fail(e);
    }
  };

  const runReduction = async () => {
    setMessage('Condensing (Craig-Bampton)…');
    try {
      const problem = baseProblem();
      const masters = probeNodes(problem);
      problem.analysis = {
        type: 'reduction', method: 'craig_bampton',
        master_nodes: masters, n_modes: 4, compare_full: true,
      };
      const r = await post('reduction', problem);
      setKind('reduction'); setShapes(null); setChart(null);
      setRows(r.reduced_frequencies_hz.map((f, i) => ({
        label: `f${i + 1}`,
        value: `${f.toPrecision(5)} Hz`
          + (r.frequency_rel_error && r.frequency_rel_error[i] !== undefined
             ? ` (err ${r.frequency_rel_error[i].toExponential(1)})` : ''),
      })));
      setMessage(`${r.method}: ${r.n_reduced_dofs} reduced DOFs `
        + `(masters: nodes ${masters.join(', ')})`);
    } catch (e) {
      fail(e);
    }
  };

  const runIdentify = async () => {
    // Twin-data demo of time-domain identification: the server
    // integrates a "true" structure (E and ρ scaled off the current
    // material), adds 1% noise, and recovers both by AD through the
    // integrator — density is invisible to every static method.
    setMessage('Identifying E, ρ from a noisy synthetic trajectory…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      const trueE = 1.6 * problem.material.young;
      const trueRho = 0.7 * (problem.material.density || 1.0);
      problem.analysis = {
        type: 'identification', dt: 'auto', n_steps: 800,
        params: ['young', 'density'],
        synthetic: { young: trueE, density: trueRho, noise: 0.01, seed: 0 },
        probe_nodes: probes, damping: [0.05, 0.0],
        n_iter: 300, learning_rate: 0.1, include_fit: false,
      };
      const r = await post('identification', problem);
      setKind('identification'); setShapes(null);
      setChart({ xs: r.loss_history.map((_, i) => i),
                 series: r.loss_history.map((v) => [Math.log10(v + 1e-30)]) });
      setRows([
        { label: 'E', value: `${r.identified.young.toPrecision(5)} `
            + `(true ${trueE.toPrecision(5)})` },
        { label: 'ρ', value: `${r.identified.density.toPrecision(5)} `
            + `(true ${trueRho.toPrecision(5)})` },
      ]);
      setMessage(`Recovered in ${r.n_iter} iters `
        + `(final loss ${r.final_loss.toExponential(2)}); chart: log₁₀ loss`);
    } catch (e) {
      fail(e);
    }
  };

  const runIdentifyField = async () => {
    // Field-mode demo: a linear stiffness gradient E(x) rising 50%
    // across the span is synthesized per element; the server recovers
    // it as an MLP field (the PINN NN-property parameterization) from
    // the probe nodes' transient histories.
    setMessage('Identifying the E(x) profile from transient histories…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      const xs = problem.nodes.map((n) => n.x);
      const cx = problem.elements.map(([i, j]) => 0.5 * (xs[i] + xs[j]));
      const xmin = Math.min(...cx);
      const span = Math.max(Math.max(...cx) - xmin, 1e-9);
      const e0 = problem.material.young;
      const trueE = cx.map((x) => e0 * (1 + 0.5 * (x - xmin) / span));
      problem.analysis = {
        type: 'identification',
        field: { name: 'young', hidden_layers: 1, neurons_per_layer: 8,
                 seed: 0 },
        dt: 'auto', n_steps: 600,
        synthetic: { young: trueE },
        probe_nodes: probes, damping: [0.05, 0.0],
        n_iter: 600, learning_rate: 0.05, include_fit: false,
      };
      const r = await post('identification', problem);
      setKind('identification'); setShapes(null);
      const fit = r.identified_field.at_elements.values;
      setChart({ xs: fit.map((_, i) => i),
                 series: fit.map((v, i) => [trueE[i], v]) });
      setRows([
        { label: 'elements', value: `${fit.length}` },
        { label: 'max error',
          value: `${(100 * r.field_max_rel_error).toFixed(1)}%` },
        { label: 'E range', value: `${Math.min(...fit).toPrecision(4)} – `
            + `${Math.max(...fit).toPrecision(4)}` },
      ]);
      setMessage(`Recovered E(x) in ${r.n_iter} iters; chart: true vs `
        + 'identified profile by element');
    } catch (e) {
      fail(e);
    }
  };

  const runSpectrum = async () => {
    // Spectrum-generation demo: the Quake record generates a response
    // spectrum (vectorized SDOF sweep) driving the modal combination,
    // evaluated exactly at the modal frequencies.
    setMessage('Generating the response spectrum…');
    try {
      const problem = baseProblem();
      const modal = await post('modal', { ...problem,
        analysis: { n_modes: 4, include_shapes: false } });
      const om = modal.omegas;
      const w1 = om[0] || 1, wN = om[om.length - 1] || 2 * (om[0] || 1);
      problem.analysis = {
        type: 'spectrum', direction: [1, 0], n_modes: 4,
        combination: 'cqc', damping_ratio: 0.05,
        sa: { history: { type: 'sine', frequency_hz: 0.05 },
              dt: 0.05, n_steps: 4000, damping_ratio: 0.05,
              curve_omegas: { start: 0.2 * w1, stop: 2.0 * wN,
                              num: 120 } },
      };
      const r = await post('spectrum', problem);
      setKind('spectrum'); setShapes(null);
      const curve = r.spectrum_curve;
      setChart({ xs: curve.omegas, series: curve.psa.map((v) => [v]) });
      setRows(r.sa_at_modes.map((sa, i) => ({
        label: `Sa(ω${i + 1})`, value: sa.toPrecision(4),
      })));
      setMessage(`${r.combination.toUpperCase()} peak |u| = `
        + `${Math.max(...r.displacements).toPrecision(4)}, modal mass `
        + `${(100 * r.mass_fraction).toFixed(1)}%; chart: PSa(ω)`);
    } catch (e) {
      fail(e);
    }
  };

  const runOptimize = async () => {
    // Sizing demo (the design-side inverse): minimum-mass member areas
    // under an allowable-stress limit of 5% of E (a strain allowable,
    // so the demo works in any unit system).
    setMessage('Sizing members for minimum mass…');
    try {
      const problem = baseProblem();
      const limit = 0.05 * problem.material.young;
      problem.analysis = {
        type: 'sizing', stress_limit: limit,
        min_area: 1e-4 * (problem.material.area || 1.0),
        n_iter: 150, outer_rounds: 4, learning_rate: 0.08,
      };
      const r = await post('sizing', problem);
      setKind('sizing'); setShapes(null);
      setChart({ xs: r.history.map((_, i) => i),
                 series: r.history.map((v) => [Math.log10(v + 1e-30)]) });
      setRows([
        { label: 'mass', value: `${r.mass_initial.toPrecision(5)} → `
            + `${r.mass.toPrecision(5)} `
            + `(−${(100 * r.mass_reduction).toFixed(1)}%)` },
        { label: 'areas', value: `${Math.min(...r.areas).toPrecision(4)} – `
            + `${Math.max(...r.areas).toPrecision(4)}` },
        { label: 'max |σ|/σ_allow',
          value: r.max_stress_ratio.toPrecision(4) },
      ]);
      setMessage(`Optimized ${r.areas.length} member areas in `
        + `${r.n_iter} ADAM iterations; chart: log₁₀ loss`);
    } catch (e) {
      fail(e);
    }
  };

  const runReliability = async () => {
    // FORM reliability demo (the assessment-side inverse): a statics
    // solve fixes the mean-load stress level, every member gets a
    // resistance 30% above it (lognormal, 10% scatter), and FORM asks:
    // with ±20% load and 5% stiffness scatter, how likely is ANY
    // member to exceed it?  Mirrors app.js runReliability().
    setMessage('Assessing failure probability (FORM)…');
    try {
      const problem = baseProblem();
      // Mean-load stress level from the generic statics route (the
      // classic route's reference BC quirk breaks fixed_x + fixed_y
      // sketches); member stresses recovered here: eps = g·u_e / L².
      // Scalar-material statics (an attached NN young field is
      // dropped — the uncertainty model scatters the scalar value).
      const s = await post('solve-generic',
                           { ...problem, analysis: undefined,
                             nn_config: undefined });
      const u = s.displacements;
      const E = problem.material.young;
      const stresses = problem.elements.map(([i, j2]) => {
        const dx = problem.nodes[j2].x - problem.nodes[i].x;
        const dy = problem.nodes[j2].y - problem.nodes[i].y;
        const l2 = dx * dx + dy * dy;
        const eps = ((u[2 * j2] - u[2 * i]) * dx
                     + (u[2 * j2 + 1] - u[2 * i + 1]) * dy) / l2;
        return E * eps;
      });
      const smax = Math.max(...stresses.map(Math.abs));
      if (!(smax > 0)) throw new Error('no stressed members to assess');
      problem.analysis = {
        type: 'reliability',
        variables: [
          { name: 'E', kind: 'young', distribution: 'lognormal',
            mean: problem.material.young, cov: 0.05 },
          { name: 'S', kind: 'load_scale', distribution: 'normal',
            mean: 1.0, std: 0.2 },
          { name: 'R', kind: 'resistance', distribution: 'lognormal',
            mean: 1.3 * smax, cov: 0.1 },
        ],
        limit_state: { type: 'stress', variable: 'R' },
      };
      const r = await post('reliability', problem);
      setKind('reliability'); setShapes(null);
      // null beta = unreachable limit state (infinitely safe): cap at
      // 8 for the chart rather than plotting 0.
      setChart({ xs: r.beta.map((_, i) => i),
                 series: r.beta.map((v) => [v === null ? 8 : Math.min(v, 8)]) });
      const crit = r.critical_limit_state;
      const [lo, hi] = r.system_pf_bounds;
      setRows([
        { label: 'min β',
          value: `${r.beta_min.toPrecision(4)} (${r.labels[crit]})` },
        { label: 'pf (critical)', value: r.pf[crit].toExponential(2) },
        { label: 'system pf',
          value: `[${lo.toExponential(2)}, ${hi.toExponential(2)}]` },
      ]);
      setMessage(`FORM over ${r.labels.length} limit states `
        + `(resistance 1.3× the mean-load stress); chart: β per member`);
    } catch (e) {
      fail(e);
    }
  };

  // Reinterpret the truss sketch as a RIGID-JOINTED frame: same
  // geometry, solid-square section I = A²/12, the truss loads carried
  // over with zero nodal moments; fully-pinned sketch nodes become
  // clamps (rotation fixed), partial fixities keep their
  // translational DOF only.  The io/frame_io.py document contract.
  const frameDoc = (problem, analysis) => {
    const nodes = problem.nodes.map((n) => [n.x, n.y]);
    const loads = [];
    const fixed = [];
    problem.nodes.forEach((n, i) => {
      loads.push(problem.loads[2 * i] || 0, problem.loads[2 * i + 1] || 0, 0);
      if (n.fixed_x) fixed.push(3 * i);
      if (n.fixed_y) fixed.push(3 * i + 1);
      if (n.fixed_x && n.fixed_y) fixed.push(3 * i + 2);
    });
    const A = problem.material.area || 1;
    return {
      nodes, elements: problem.elements, loads, fixed_dofs: fixed,
      material: { young: problem.material.young, area: A,
                  inertia: A * A / 12,
                  density: problem.material.density || 1 },
      analysis,
    };
  };

  const runFrame = async () => {
    // Frame statics + modal on the sketch with rigid joints — the
    // round-3 element family reaching the UI tier (VERDICT r3 #1).
    setMessage('Solving the sketch as a rigid-jointed frame…');
    try {
      const problem = baseProblem();
      const s = await post('frame', frameDoc(problem, { type: 'static' }));
      const m = await post('frame', frameDoc(problem,
        { type: 'modal', n_modes: 4, include_shapes: true }));
      setKind('frame'); setChart(null);
      // FEMCanvas overlays 2-DOF shapes: project out the rotations.
      setShapes(m.mode_shapes.map((phi) =>
        phi.filter((_, d) => d % 3 !== 2)));
      const aMax = Math.max(...s.axial_forces.map(Math.abs));
      const mMax = Math.max(...s.end_moments.flat().map(Math.abs));
      setRows([
        { label: 'max |N|', value: aMax.toPrecision(4) },
        { label: 'max |M|', value: mMax.toPrecision(4) },
        ...m.frequencies_hz.map((f, i) => ({
          label: `f${i + 1}`, value: `${f.toPrecision(5)} Hz` })),
      ]);
      setMessage(`Rigid joints carry moment: max |M| = ${mMax.toPrecision(4)}; `
        + `f₁ = ${m.frequencies_hz[0].toPrecision(5)} Hz`);
    } catch (e) {
      fail(e);
    }
  };

  const runPlane = async () => {
    // 2D continuum demo: an end-loaded cantilever membrane (24×6 Q4
    // grid, Timoshenko's closed-form benchmark) with the sketch's
    // material — the plane family's UI entry (io/plane_io.py).
    setMessage('Solving the plane-stress cantilever patch…');
    try {
      const E = baseProblem().material.young;
      const r = await post('plane', {
        mesh: { type: 'rect', width: 4, height: 1, nx: 24, ny: 6,
                element: 'quad' },
        material: { young: E, poisson: 0.3, thickness: 0.1,
                    density: 1 },
        edge_loads: [{ nodes: [24, 49, 74, 99, 124, 149, 174],
                       traction: [0, -0.01 * E] }],
        fixed_nodes: [0, 25, 50, 75, 100, 125, 150],
        analysis: { type: 'static' },
      });
      setKind('plane'); setShapes(null); setChart(null);
      const uy = r.displacements.filter((_, d) => d % 2 === 1);
      const tip = Math.min(...uy);
      setRows([
        { label: 'tip deflection', value: tip.toPrecision(4) },
        { label: 'max von Mises',
          value: `${r.max_von_mises.toPrecision(4)} `
            + `(element ${r.max_von_mises_element})` },
      ]);
      setMessage('End-loaded plane-stress cantilever: 144 Q4 elements, '
        + `tip ${tip.toPrecision(4)}`);
    } catch (e) {
      fail(e);
    }
  };

  const runSolid = async () => {
    // 3D continuum demo: a hex8 box column under uniaxial top
    // traction with symmetry supports — exact closed form
    // u_z = 0.05·E·4/E = 0.2, von Mises = 0.05·E everywhere
    // (io/solid_io.py; POST body pinned as
    // tests/fixtures/ui_payload_solid.json, byte-identical to the
    // static UI's solidDoc()).
    setMessage('Solving the 3D hex8 column…');
    try {
      const E = baseProblem().material.young;
      const r = await post('solid', {
        mesh: { type: 'box', lx: 1, ly: 1, lz: 4, nx: 2, ny: 2,
                nz: 8 },
        material: { young: E, poisson: 0.3, density: 1 },
        fixed_z_nodes: 'z_min',
        fixed_x_nodes: 'x_min',
        fixed_y_nodes: 'y_min',
        surface_loads: [{ face: 'z_max',
                          traction: [0, 0, 0.05 * E] }],
        analysis: { type: 'static' },
      });
      setKind('solid'); setShapes(null); setChart(null);
      setRows([
        { label: 'max |u|',
          value: `${r.max_displacement.toPrecision(4)} (exact 0.2000)` },
        { label: 'max von Mises',
          value: `${r.max_von_mises.toPrecision(4)} (exact 0.05·E)` },
      ]);
      setMessage('3D hex8 column (2×2×8 box): uniaxial closed form '
        + `reproduced, max |u| ${r.max_displacement.toPrecision(4)}`);
    } catch (e) {
      fail(e);
    }
  };

  const runPlate = async () => {
    // Mindlin plate bending demo: hard-SS square, t/a = 0.01, uniform
    // pressure q = -0.001·E — center deflection on the EXACT
    // Mindlin/Navier series (w scales 1/E so the number is the same
    // for any E; io/plate_io.py; POST body pinned as
    // tests/fixtures/ui_payload_plate.json, byte-identical to the
    // static UI's plateDoc()).
    setMessage('Bending the Mindlin plate…');
    try {
      const E = baseProblem().material.young;
      const r = await post('plate', {
        mesh: { type: 'rect', width: 1, height: 1, nx: 16, ny: 16 },
        material: { young: E, poisson: 0.3, thickness: 0.01,
                    density: 1 },
        pressure: -0.001 * E,
        supports: { simply_supported: ['left', 'right', 'bottom',
                                       'top'] },
        analysis: { type: 'static' },
      });
      // Center-line deflection profile w(x, a/2): grid row j = 8.
      const xs = [];
      const w = [];
      for (let i = 0; i <= 16; i++) {
        xs.push(i / 16);
        w.push([r.displacements[3 * (8 * 17 + i)]]);
      }
      setKind('plate'); setShapes(null);
      setChart({ times: xs, series: w, labels: ['w(x, a/2)'] });
      setRows([
        { label: 'center w',
          value: `${r.max_deflection.toPrecision(4)} (exact Mindlin `
            + 'series 44.38, any E)' },
        { label: 'extreme-fiber von Mises',
          value: r.max_von_mises.toPrecision(4) },
      ]);
      setMessage('Mindlin SS plate (16×16 MITC4 Q4, t/a = 0.01): center '
        + `deflection ${r.max_deflection.toPrecision(4)} on the exact `
        + 'series; chart: center-line profile');
    } catch (e) {
      fail(e);
    }
  };

  const runSolidPlastic = async () => {
    // 3D J2 bilinear column (POST body pinned as
    // tests/fixtures/ui_payload_solid_plastic.json, byte-identical to
    // the static UI's runSolidPlastic): free lateral contraction makes
    // 3D von Mises reproduce the 1D bilinear law EXACTLY, so the tip
    // u_z = L(σ/E + (σ−σ_y)/H) = 0.065 and the capacity curve kinks
    // at σ_y = 1 (ops/solid_plastic.py anchors).
    setMessage('Yielding the 3D hex8 column…');
    try {
      const r = await post('solid', {
        mesh: { type: 'box', lx: 1, ly: 1, lz: 2, nx: 2, ny: 2,
                nz: 6 },
        material: { young: 200, poisson: 0.3, density: 2 },
        fixed_z_nodes: 'z_min',
        fixed_x_nodes: 'x_min',
        fixed_y_nodes: 'y_min',
        surface_loads: [{ face: 'z_max', traction: [0, 0, 1.5] }],
        analysis: {
          type: 'plastic', sigma_y: 1, hardening: 20,
          load_factors: [0.125, 0.25, 0.375, 0.5, 0.625, 0.75,
                         0.875, 1],
          tolerance: 1e-10, probe_nodes: 'z_max',
        },
      });
      const tipZ = r.displacements.map((row) => {
        const zs = row.filter((_, d) => d % 3 === 2);
        return [zs.reduce((a, b) => a + b, 0) / zs.length];
      });
      setKind('solid-plastic'); setShapes(null);
      setChart({ xs: r.load_factors, series: tipZ });
      setRows([
        { label: 'tip u_z',
          value: `${tipZ[tipZ.length - 1][0].toPrecision(4)} (exact 0.065)` },
        { label: 'yielded',
          value: `${r.yielded_elements.length} / 24 elements` },
        { label: 'peak von Mises',
          value: Math.max(...r.max_von_mises).toPrecision(4) },
      ]);
      setMessage('3D J2 bilinear column: capacity curve kinks at σ_y '
        + '(exact endpoint 0.065)');
    } catch (e) {
      fail(e);
    }
  };

  const runShakedown = async () => {
    // Explicit elastoplastic transient (POST body pinned as
    // tests/fixtures/ui_payload_plastic_transient.json, byte-identical
    // to the static UI's runShakedown): quasi-static trapezoid ramp of
    // the uniaxial strip to sigma = 16 > sigma_y = 12, unload, settle —
    // residual closed form alpha = (16−12)/H = 0.2, tip u_x = W·alpha
    // = 0.8 (solvers/continuum_transient_plastic.py).
    setMessage('Ramping the strip past yield…');
    try {
      const r = await post('plane', {
        mesh: { type: 'rect', width: 4, height: 2, nx: 2, ny: 1,
                element: 'quad' },
        material: { young: 200, poisson: 0.3, thickness: 0.5,
                    density: 2 },
        fixed_x_nodes: 'left',
        fixed_y_nodes: 'bottom',
        edge_loads: [{ nodes: 'right', traction: [16, 0] }],
        analysis: {
          type: 'transient', dt: 'auto', n_steps: 4000,
          record_every: 100, damping: [1.5, 0],
          amplitude: { type: 'trapezoid', t_rise: 200, t_hold: 50,
                       t_fall: 200 },
          probe_nodes: 'right',
          plasticity: { sigma_y: 12, hardening: 20 },
        },
      });
      const tipX = r.displacements.map((row) => {
        const xs = row.filter((_, d) => d % 2 === 0);
        return [xs.reduce((a, b) => a + b, 0) / xs.length];
      });
      const alpha = r.final.eq_plastic_strain;
      const mean = alpha.reduce((a, b) => a + b, 0) / alpha.length;
      setKind('shakedown'); setShapes(null);
      setChart({ xs: r.times, series: tipX });
      setRows([
        { label: 'residual tip u_x',
          value: `${tipX[tipX.length - 1][0].toPrecision(4)} (exact 0.8)` },
        { label: 'eq. plastic strain',
          value: `${mean.toPrecision(4)} (exact 0.2)` },
        { label: 'plastic work',
          value: r.plastic_work[r.plastic_work.length - 1]
            .toPrecision(4) },
      ]);
      setMessage('Elastoplastic shakedown: load, yield, unload onto '
        + 'the exact residual plateau');
    } catch (e) {
      fail(e);
    }
  };

  const runQuakeWall = async () => {
    // Seismic response spectrum of a plane-stress shear wall (POST
    // body pinned as tests/fixtures/ui_payload_plane_spectrum.json,
    // byte-identical to the static UI's runQuakeWall): flat Sa = 2.5
    // in x, CQC at 5% damping — the dyn-plane-spectrum corpus problem
    // (solvers/continuum_spectrum.py).
    setMessage('Shaking the shear wall…');
    try {
      const r = await post('plane', {
        mesh: { type: 'rect', width: 4, height: 8, nx: 4, ny: 8,
                element: 'quad' },
        material: { young: 200, poisson: 0.3, thickness: 0.5,
                    density: 2 },
        fixed_nodes: 'bottom',
        analysis: {
          type: 'spectrum', sa: 2.5, direction: [1, 0], n_modes: 6,
          combination: 'cqc', damping_ratio: 0.05,
        },
      });
      const total = r.effective_mass.reduce((a, b) => a + b, 0)
        / r.mass_fraction;
      setKind('quake-wall'); setShapes(null);
      setChart({ xs: r.omegas,
                 series: r.effective_mass.map((m) => [m / total]) });
      setRows([
        { label: 'peak |u|', value: r.max_displacement.toPrecision(4) },
        { label: 'peak von Mises',
          value: r.max_von_mises.toPrecision(4) },
        { label: 'modal mass',
          value: `${(100 * r.mass_fraction).toFixed(1)}% in 6 modes` },
      ]);
      setMessage('Shear-wall CQC spectrum (chart: effective mass per '
        + 'mode)');
    } catch (e) {
      fail(e);
    }
  };

  const runPushover = async () => {
    // Elastoplastic pushover of the sketch: yield at 80% of the
    // mean-load elastic stress level (the Reliability two-step flow),
    // ramp to 3× — the capacity curve every pushover code plots.
    setMessage('Pushing over (elastoplastic)…');
    try {
      const problem = baseProblem();
      const probes = probeNodes(problem);
      const s = await post('solve-generic',
                           { ...problem, analysis: undefined,
                             nn_config: undefined });
      const u = s.displacements;
      const E = problem.material.young;
      const stresses = problem.elements.map(([i, j2]) => {
        const dx = problem.nodes[j2].x - problem.nodes[i].x;
        const dy = problem.nodes[j2].y - problem.nodes[i].y;
        const l2 = dx * dx + dy * dy;
        const eps = ((u[2 * j2] - u[2 * i]) * dx
                     + (u[2 * j2 + 1] - u[2 * i + 1]) * dy) / l2;
        return E * eps;
      });
      const smax = Math.max(...stresses.map(Math.abs));
      if (!(smax > 0)) throw new Error('no stressed members to push');
      const nSteps = 24;
      problem.analysis = {
        type: 'plastic', sigma_y: 0.8 * smax, hardening: 0.05 * E,
        load_factors: Array.from({ length: nSteps },
                                 (_, i) => 3.0 * (i + 1) / nSteps),
        probe_nodes: probes,
      };
      // Scalar-material pushover (an attached NN young field is
      // dropped — yield vs stress needs the scalar value, the same
      // decision runReliability documents).
      const r = await post('plastic', { ...problem,
                                        nn_config: undefined });
      setKind('plastic'); setShapes(null);
      setChart({ xs: r.load_factors, series: r.displacements });
      const yielded = r.yielded_elements.length;
      setRows([
        { label: 'yielded', value: `${yielded} / ${stresses.length} members` },
        { label: 'residual', value: r.max_residual.toExponential(2) },
        { label: 'peak |σ|',
          value: Math.max(...r.max_abs_stress).toPrecision(4) },
      ]);
      setMessage(`Pushover to 3× (yield at 0.8σ_max): capacity curve at `
        + `nodes ${probes.join(', ')}; ${yielded} members yielded`);
    } catch (e) {
      fail(e);
    }
  };

  const runPortal = async () => {
    // Plastic-hinge pushover of the canonical rectangular portal
    // (POST body pinned as tests/fixtures/ui_payload_portal.json,
    // byte-identical to the static UI's portalDoc()): columns h=3,
    // beam 4, uniform Mp=500, unit sway load — EPP bending hinges at
    // ±Mp via static condensation, ramped hinge-by-hinge to the EXACT
    // plastic-theory sway mechanism λ_c = 4·Mp/h = 666.67
    // (solvers/frame_plastic.py).
    setMessage('Pushing the portal frame to collapse…');
    try {
      const r = await post('frame', {
        nodes: [[0, 0], [0, 3], [4, 3], [4, 0]],
        elements: [[0, 1], [1, 2], [2, 3]],
        material: { young: 2e11, area: 0.01, inertia: 1e-4,
                    density: 7850 },
        loads: [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
        fixed_nodes: [0, 3],
        analysis: { type: 'plastic', plastic_moment: 500,
                    probe_nodes: [1] },
      });
      setKind('portal'); setShapes(null);
      // Probe node 1's (u_x, u_y, θ) per hinge event: the sway
      // capacity curve is column 0.
      setChart({ xs: r.load_factors,
                 series: r.displacements.map((row) => [row[0]]) });
      setRows([
        { label: 'collapse λ',
          value: `${r.collapse_factor.toPrecision(6)} (exact 4·Mp/h `
            + '= 666.667)' },
        { label: 'hinges',
          value: r.hinges.map((h) =>
            `m${h.member}${h.end ? 'j' : 'i'}`).join(', ') },
      ]);
      setMessage('Portal sway mechanism: hinge-by-hinge capacity curve '
        + 'to the exact plastic collapse load');
    } catch (e) {
      fail(e);
    }
  };

  const runGrillage = async () => {
    // 3D space-frame grillage FRF (POST body pinned as
    // tests/fixtures/ui_payload_grillage.json, byte-identical to the
    // static UI's grillageDoc()): right-angle grillage, leg AB along
    // X clamped at A, leg BC along Y, unit vertical load at C —
    // torsion-bending coupling no 2D family carries.  The harmonic
    // sweep's ω→0 limit IS the exact static closed form
    // |w_C| = PL₁³/3EIy + PL₂³/3EIy + PL₂²L₁/GJ = 7.91667
    // (models/frame3d.py), and the chart shows the first three
    // resonances of the 6-DOF-per-node pencil.
    setMessage('Sweeping the 3D grillage tip FRF…');
    try {
      const r = await post('frame3d', {
        nodes: [[0, 0, 0], [3, 0, 0], [3, 2, 0]],
        elements: [[0, 1], [1, 2]],
        material: { young: 200, shear_modulus: 80, area: 1,
                    inertia_y: 0.02, inertia_z: 0.05, torsion: 0.03,
                    density: 1.2 },
        loads: [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                0, 0, -1, 0, 0, 0],
        fixed_nodes: [0],
        analysis: { type: 'harmonic',
                    omegas: { start: 1e-6, stop: 1.0, num: 120 },
                    damping: [0.005, 0.005], probe_dofs: [14] },
      });
      setKind('grillage'); setShapes(null);
      setChart({ xs: r.omegas,
                 series: r.amplitude.map((row) => [row[0]]) });
      const amp = r.amplitude.map((row) => row[0]);
      let peak = 1;                       // interior resonance peak
      for (let i = 1; i + 1 < amp.length; i += 1) {
        if (amp[i] > amp[i - 1] && amp[i] > amp[i + 1]
            && amp[i] > amp[peak]) peak = i;
      }
      setRows([
        { label: 'static limit |w_C|',
          value: `${amp[0].toPrecision(6)} (exact `
            + 'PL₁³/3EIy + PL₂³/3EIy + PL₂²L₁/GJ = 7.91667)' },
        { label: 'resonance',
          value: `ω ≈ ${r.omegas[peak].toPrecision(4)} rad/s, `
            + `|X| = ${amp[peak].toPrecision(4)}` },
      ]);
      setMessage('3D grillage: tip FRF through the torsion-bending '
        + 'coupled space-frame pencil');
    } catch (e) {
      fail(e);
    }
  };

  const runRoof = async () => {
    // Scordelis-Lo barrel roof on the flat-facet shell family (POST
    // body pinned as tests/fixtures/ui_payload_roof.json,
    // byte-identical to the static UI's roofDoc()): R=25, L=50, 40°
    // half-angle, t=0.25, self-weight 90/area, rigid end diaphragms.
    // The 16×16 facet mesh puts the midside free-edge deflection at
    // −0.29514, converging from below onto the published obstacle-
    // course target 0.3024 (models/shell.py; the corpus doc
    // dyn-shell.json gates the same value).  Chart: the midspan
    // w profile from free edge to free edge across the crown.
    setMessage('Solving the Scordelis-Lo roof…');
    try {
      const mid = [];
      for (let i = 0; i <= 16; i += 1) mid.push(8 * 17 + i);
      const r = await post('shell', {
        mesh: { type: 'cylinder_panel', radius: 25, length: 50,
                half_angle_deg: 40, nx: 16, ny: 16 },
        material: { young: 4.32e8, poisson: 0, thickness: 0.25,
                    density: 1 },
        supports: [{ nodes: 'y_min', dofs: [0, 2] },
                   { nodes: 'y_max', dofs: [0, 2] },
                   // one u_y pin removes the axial rigid mode the
                   // diaphragms leave free (solution unchanged)
                   { nodes: [0], dofs: [1] }],
        body_force: [0, 0, -90],
        analysis: { type: 'static', probe_nodes: mid },
      });
      setKind('roof'); setShapes(null);
      // probe_displacements: 6 DOFs per midspan node; w is index 2.
      const w = [];
      for (let i = 0; i <= 16; i += 1) {
        w.push(r.probe_displacements[6 * i + 2]);
      }
      const arc = w.map((_, i) => -40 + 5 * i);
      setChart({ xs: arc, series: w.map((v) => [v]) });
      setRows([
        { label: 'free-edge w',
          value: `${w[16].toPrecision(6)} (published target −0.3024; `
            + 'faceted 16×16 = −0.29514)' },
        { label: 'crown w', value: w[8].toPrecision(6) },
      ]);
      setMessage('Scordelis-Lo roof: midspan deflection profile '
        + 'across the arc (shell obstacle course)');
    } catch (e) {
      fail(e);
    }
  };

  const runShellPlastic = async () => {
    // Layered elastoplastic shell strip under COMBINED membrane
    // tension + bending (POST body pinned as
    // tests/fixtures/ui_payload_shell_plastic.json, byte-identical
    // to the static UI's runShellPlastic): clamped 4×1 flat-facet
    // strip, axial force at n = N/(σ_y t) = 0.5, right-edge moment
    // ramped to the rectangular-section interaction capacity
    // m = M/Mp = 1 − n² = 0.75 — the N-M coupling no uncoupled
    // family reproduces (ops/shell_plastic.py).
    setMessage('Ramping the shell strip to its N-M capacity…');
    try {
      const r = await post('shell', {
        nodes: [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0], [4, 0, 0],
                [0, 1, 0], [1, 1, 0], [2, 1, 0], [3, 1, 0],
                [4, 1, 0]],
        elements: [[0, 1, 6, 5], [1, 2, 7, 6], [2, 3, 8, 7],
                   [3, 4, 9, 8]],
        material: { young: 200000, poisson: 0, thickness: 0.1,
                    density: 1 },
        supports: [{ nodes: 'x_min', dofs: [0, 1, 2, 3, 4, 5] }],
        point_loads: [[4, 0, 7.5], [9, 0, 7.5],
                      [4, 4, -0.28125], [9, 4, -0.28125]],
        analysis: { type: 'plastic', sigma_y: 300, n_layers: 20,
                    load_factors: [0.2, 0.4, 0.6, 0.8, 0.9, 1.0],
                    probe_nodes: [4] },
      });
      setKind('shellplastic'); setShapes(null);
      // probe rows: the 6 DOFs of tip node 4; θ_y is index 4.
      setChart({ xs: r.load_factors,
                 series: r.displacements.map(
                   (row) => [Math.abs(row[4])]) });
      setRows([
        { label: 'yielded',
          value: `${r.yielded_elements.length} / 4 facets through `
            + `${r.n_layers} layers` },
        { label: 'membrane N',
          value: `${r.final.membrane_forces[0][0].toPrecision(4)} `
            + '(= 0.5 σ_y t — the axial half of the interaction)' },
        { label: 'fiber von Mises',
          value: `${Math.max(...r.max_von_mises).toPrecision(4)} `
            + '(EPP pin at σ_y = 300)' },
      ]);
      setMessage('Shell strip at the interaction capacity m = 1 − n² '
        + '(n = 0.5): tip-rotation capacity curve');
    } catch (e) {
      fail(e);
    }
  };

  const runSnapArch = async () => {
    // Shallow half-sine arch snap-through (POST body pinned as
    // tests/fixtures/ui_payload_snap_arch.json, byte-identical to
    // the static UI's runSnapArch): rise e = 1.5t over L = 4 with
    // the server-built half-sine load — the continuum path is the
    // EXACT single-mode cubic λ(a) = −(Dk⁴a + EAk⁴(ea/2 + a²/4)
    // (e + a)), upper limit ≈ 2.8944 per unit width, traced through
    // BOTH folds by Crisfield arc length
    // (solvers/shell_nonlinear.py).
    setMessage('Tracing the arch through its snap…');
    try {
      const fixed = [];
      for (const nd of [0, 32, 33, 65]) {
        for (const d of [0, 1, 2]) fixed.push(6 * nd + d);
      }
      for (let nd = 0; nd < 66; nd += 1) fixed.push(6 * nd + 3);
      fixed.sort((a, b) => a - b);
      const r = await post('shell', {
        mesh: { type: 'arch_strip', length: 4, width: 1, rise: 0.15,
                nx: 32 },
        material: { young: 200000, poisson: 0, thickness: 0.1,
                    density: 1 },
        sine_load: 1,
        fixed_dofs: fixed,
        analysis: { type: 'continuation', n_steps: 60, dl0: 0.02,
                    max_dl: 0.08, tolerance: 1e-9,
                    probe_nodes: [16] },
      });
      setKind('snaparch'); setShapes(null);
      const w = r.displacements.map((row) => -row[2]);
      setChart({ xs: w, series: r.load_factors.map((v) => [v]) });
      let lim = -Infinity;
      for (let i = 0; i < w.length; i += 1) {
        if (w[i] < 0.15 && r.load_factors[i] > lim) {
          lim = r.load_factors[i];
        }
      }
      setRows([
        { label: 'limit load λ',
          value: `${lim.toPrecision(5)} (exact single-mode cubic `
            + '2.8944)' },
        { label: 'λ_min (unstable branch)',
          value: Math.min(...r.load_factors).toPrecision(4) },
      ]);
      setMessage('Arch snap-through: λ vs midspan deflection '
        + 'through both limit points (Marguerre + arc length)');
    } catch (e) {
      fail(e);
    }
  };

  const runSlab = async () => {
    // Layered elastoplastic one-way slab strip (POST body pinned as
    // tests/fixtures/ui_payload_slab.json, byte-identical to the
    // static UI's runSlab): SS 8×1 strip, ν=0, pressure = the
    // beam-mechanism limit q_u = 8·Mp/L², ramped to 0.95 q_u — yield
    // spreads from the midspan extreme fibers through 20 plane-stress
    // J2 layers (solvers/plate_plasticity.py).
    setMessage('Pushing the slab strip toward its mechanism…');
    try {
      const r = await post('plate', {
        mesh: { type: 'rect', width: 8, height: 1, nx: 16, ny: 1 },
        material: { young: 200000, poisson: 0, thickness: 0.1,
                    density: 1 },
        pressure: 0.09375,
        supports: { simply_supported: ['left', 'right'] },
        analysis: { type: 'plastic', sigma_y: 300, n_layers: 20,
                    load_factors: [0.2, 0.4, 0.6, 0.7, 0.8, 0.85, 0.9,
                                   0.95],
                    probe_nodes: [8, 25] },
      });
      setKind('slab'); setShapes(null);
      setChart({ xs: r.load_factors,
                 series: r.displacements.map((row) => [row[0]]) });
      setRows([
        { label: 'yielded',
          value: `${r.yielded_elements.length} / 16 elements` },
        { label: 'fiber von Mises',
          value: `${Math.max(...r.max_von_mises).toPrecision(4)} `
            + '(EPP pin at σ_y = 300)' },
      ]);
      setMessage('One-way slab at 0.95 q_u = 8·Mp/L²: midspan capacity '
        + 'curve softening toward the beam mechanism');
    } catch (e) {
      fail(e);
    }
  };

  const runPlanePlastic = async () => {
    // Thick-wall cylinder at 99% of the textbook limit pressure
    // p_lim = (2/√3)σ_y ln(b/a): B-bar von Mises plane strain, the
    // plastic front spreading from the bore (tests/test_plane_plastic).
    setMessage('Pressurizing the thick-wall cylinder…');
    try {
      const plim = (2 / Math.sqrt(3)) * Math.log(2);
      const fr = [0.5, 0.9, 0.99].map((f) => f * plim);
      const r = await post('plane', {
        mesh: { type: 'annulus', r_inner: 1, r_outer: 2, nr: 6, nt: 8 },
        material: { young: 1000, poisson: 0.3, thickness: 1,
                    density: 1 },
        plane_strain: true,
        edge_loads: [{ nodes: [0, 7, 14, 21, 28, 35, 42, 49, 56],
                       pressure: 1 }],
        fixed_y_nodes: [0, 1, 2, 3, 4, 5, 6],
        fixed_x_nodes: [56, 57, 58, 59, 60, 61, 62],
        analysis: { type: 'plastic', sigma_y: 1, load_factors: fr,
                    tolerance: 1e-8, max_iterations: 40,
                    probe_nodes: [0] },
      });
      setKind('plane-plastic'); setShapes(null);
      setChart({ xs: r.load_factors,
                 series: r.displacements.map((row) => [row[0]]) });
      setRows([
        { label: 'p / p_lim', value: '0.99' },
        { label: 'plastic elements',
          value: `${r.n_plastic[r.n_plastic.length - 1]} / 48` },
        { label: 'peak von Mises',
          value: Math.max(...r.max_von_mises).toPrecision(4) },
      ]);
      setMessage('Von Mises cylinder at 0.99 p_lim: bore displacement '
        + 'vs pressure (the knee is the plastic front)');
    } catch (e) {
      fail(e);
    }
  };

  return (
    <div className="dynamics-panel">
      <h3>Dynamics</h3>
      <div className="row">
        <button onClick={() => run('modal')}>Modal ▶</button>
        <button onClick={() => run('buckling')}>Buckling ▶</button>
        <button onClick={runTransient}>Transient ▶</button>
        <button onClick={() => sweep('harmonic')}>Harmonic ▶</button>
        <button onClick={() => sweep('random')}>Random ▶</button>
        <button onClick={runReduction}>Reduction ▶</button>
        <button onClick={runIdentify}>Identify ▶</button>
        <button onClick={runIdentifyField}>Identify E(x) ▶</button>
        <button onClick={runQuake}>Quake ▶</button>
        <button onClick={runSpectrum}>Spectrum ▶</button>
        <button onClick={runOptimize}>Optimize ▶</button>
        <button onClick={runReliability}>Reliability ▶</button>
        <button onClick={runFrame}>Frame ▶</button>
        <button onClick={runPlane}>Plane ▶</button>
        <button onClick={runPushover}>Pushover ▶</button>
        <button onClick={runPortal}>Portal ▶</button>
        <button onClick={runPlanePlastic}>Cylinder ▶</button>
        <button onClick={runSolid}>Solid ▶</button>
        <button onClick={runPlate}>Plate ▶</button>
        <button onClick={runSolidPlastic}>Solid plastic ▶</button>
        <button onClick={runSlab}>Slab ▶</button>
        <button onClick={runGrillage}>Grillage ▶</button>
        <button onClick={runRoof}>Roof ▶</button>
        <button onClick={runShellPlastic}>Shell plastic ▶</button>
        <button onClick={runSnapArch}>Snap arch ▶</button>
        <button onClick={runShakedown}>Shakedown ▶</button>
        <button onClick={runQuakeWall}>Quake wall ▶</button>
      </div>
      <table>
        <tbody>
          {rows.map((r, i) => (
            <tr key={`${kind}-${i}`}>
              <td>{r.label}</td>
              <td>{r.value}</td>
              <td>
                {shapes?.[i] && (
                  <button onClick={() => onShowShape(shapes[i])}>show</button>
                )}
              </td>
            </tr>
          ))}
        </tbody>
      </table>
      {chart && <Chart xs={chart.xs} series={chart.series} />}
      <div className="status">{message}</div>
    </div>
  );
}
