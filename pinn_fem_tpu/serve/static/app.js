/* PINN-FEM-TPU browser UI — zero-dependency canvas CAD + tables.
 *
 * Capability parity with the reference React frontend (frontend/src/):
 * interactive node/element editing on a canvas with grid + deformed-shape
 * overlay and a 1–1000x deformation slider (FEMCanvas.jsx), node/element/
 * measurement tables (DataTable.jsx), per-property NN configuration, solver
 * selection (CalculateButton.jsx), POST /api/fem/solve-generic with the
 * generic problem schema, and localStorage persistence (App.jsx:27-45).
 */
"use strict";

const state = {
  nodes: [],      // {x, y, fixedX, fixedY, fx, measuredUx}
  elements: [],   // [i, j]
  mode: "select",
  selected: null,
  pendingElemNode: null,
  displacements: null,  // flat [ux0, uy0, ...]
  defScale: 100,
};

// ---------- persistence ----------
function save() {
  localStorage.setItem("pinnfem_model", JSON.stringify({
    nodes: state.nodes, elements: state.elements,
  }));
}
function load() {
  try {
    const raw = localStorage.getItem("pinnfem_model");
    if (raw) {
      const m = JSON.parse(raw);
      state.nodes = m.nodes || [];
      state.elements = m.elements || [];
    }
  } catch (e) { /* fresh start */ }
}

// ---------- canvas ----------
const canvas = document.getElementById("cad");
const ctx = canvas.getContext("2d");
const VIEW = { ox: 120, oy: 420, scale: 120 };  // world→pixel

const toPx = (x, y) => [VIEW.ox + x * VIEW.scale, VIEW.oy - y * VIEW.scale];
const toWorld = (px, py) => [(px - VIEW.ox) / VIEW.scale, (VIEW.oy - py) / VIEW.scale];

function draw() {
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  // grid
  ctx.strokeStyle = "#161c26";
  ctx.lineWidth = 1;
  for (let gx = 0; gx < canvas.width; gx += VIEW.scale / 2) {
    ctx.beginPath(); ctx.moveTo(gx, 0); ctx.lineTo(gx, canvas.height); ctx.stroke();
  }
  for (let gy = 0; gy < canvas.height; gy += VIEW.scale / 2) {
    ctx.beginPath(); ctx.moveTo(0, gy); ctx.lineTo(canvas.width, gy); ctx.stroke();
  }

  const disp = state.displacements;
  const k = state.defScale;
  const defPos = (i) => {
    const n = state.nodes[i];
    if (!disp) return [n.x, n.y];
    return [n.x + k * (disp[2 * i] || 0), n.y + k * (disp[2 * i + 1] || 0)];
  };

  // undeformed elements (dashed when a solution exists)
  for (const [i, j] of state.elements) {
    const [x1, y1] = toPx(state.nodes[i].x, state.nodes[i].y);
    const [x2, y2] = toPx(state.nodes[j].x, state.nodes[j].y);
    ctx.setLineDash(disp ? [6, 5] : []);
    ctx.strokeStyle = disp ? "#3a465a" : "#8b97a8";
    ctx.lineWidth = 2;
    ctx.beginPath(); ctx.moveTo(x1, y1); ctx.lineTo(x2, y2); ctx.stroke();
    ctx.setLineDash([]);
  }
  // deformed elements
  if (disp) {
    for (const [i, j] of state.elements) {
      const [ax, ay] = defPos(i), [bx, by] = defPos(j);
      const [x1, y1] = toPx(ax, ay), [x2, y2] = toPx(bx, by);
      ctx.strokeStyle = "#4ea1ff"; ctx.lineWidth = 2.5;
      ctx.beginPath(); ctx.moveTo(x1, y1); ctx.lineTo(x2, y2); ctx.stroke();
    }
  }
  // nodes + BC glyphs
  state.nodes.forEach((n, i) => {
    const [px, py] = toPx(n.x, n.y);
    ctx.fillStyle = i === state.selected ? "#e4b34a"
      : (i === state.pendingElemNode ? "#39c07f" : "#e6ebf2");
    ctx.beginPath(); ctx.arc(px, py, 6, 0, 2 * Math.PI); ctx.fill();
    if (n.fixedX || n.fixedY) {  // support triangle
      ctx.strokeStyle = "#e46a6a"; ctx.lineWidth = 1.5;
      ctx.beginPath();
      ctx.moveTo(px, py + 6); ctx.lineTo(px - 8, py + 18);
      ctx.lineTo(px + 8, py + 18); ctx.closePath(); ctx.stroke();
    }
    if (n.fx) {  // load arrow
      ctx.strokeStyle = "#39c07f"; ctx.lineWidth = 2;
      const dir = n.fx > 0 ? 1 : -1;
      ctx.beginPath(); ctx.moveTo(px, py); ctx.lineTo(px + 28 * dir, py);
      ctx.lineTo(px + 20 * dir, py - 5); ctx.moveTo(px + 28 * dir, py);
      ctx.lineTo(px + 20 * dir, py + 5); ctx.stroke();
    }
    if (n.fy) {  // vertical load arrow (screen y grows downward)
      ctx.strokeStyle = "#39c07f"; ctx.lineWidth = 2;
      const d = n.fy > 0 ? -1 : 1;
      ctx.beginPath(); ctx.moveTo(px, py); ctx.lineTo(px, py + 28 * d);
      ctx.lineTo(px - 5, py + 20 * d); ctx.moveTo(px, py + 28 * d);
      ctx.lineTo(px + 5, py + 20 * d); ctx.stroke();
    }
    ctx.fillStyle = "#8b97a8"; ctx.font = "11px system-ui";
    ctx.fillText(String(i), px + 8, py - 8);
  });
}

function hitNode(px, py) {
  for (let i = 0; i < state.nodes.length; i++) {
    const [nx, ny] = toPx(state.nodes[i].x, state.nodes[i].y);
    if (Math.hypot(nx - px, ny - py) < 14) return i;
  }
  return null;
}

canvas.addEventListener("click", (ev) => {
  const rect = canvas.getBoundingClientRect();
  const px = (ev.clientX - rect.left) * canvas.width / rect.width;
  const py = (ev.clientY - rect.top) * canvas.height / rect.height;
  if (state.mode === "node") {
    const [wx, wy] = toWorld(px, py);
    state.nodes.push({
      x: Math.round(wx * 4) / 4, y: Math.round(wy * 4) / 4,
      fixedX: false, fixedY: false, fx: 0, measuredUx: 0,
    });
    state.displacements = null;
  } else if (state.mode === "element") {
    const hit = hitNode(px, py);
    if (hit !== null) {
      if (state.pendingElemNode === null) {
        state.pendingElemNode = hit;
      } else if (hit !== state.pendingElemNode) {
        state.elements.push([state.pendingElemNode, hit]);
        state.pendingElemNode = null;
        state.displacements = null;
      }
    }
  } else {
    state.selected = hitNode(px, py);
  }
  save(); render();
});

// ---------- tables ----------
function numInput(value, cb, size) {
  const inp = document.createElement("input");
  inp.value = value; if (size) inp.size = size;
  inp.addEventListener("change", () => { cb(parseFloat(inp.value) || 0); save(); render(); });
  return inp;
}
function checkbox(value, cb) {
  const inp = document.createElement("input");
  inp.type = "checkbox"; inp.checked = value;
  inp.addEventListener("change", () => { cb(inp.checked); save(); render(); });
  return inp;
}

function renderTables() {
  const nt = document.getElementById("node-table");
  nt.querySelectorAll("tr:not(:first-child)").forEach((r) => r.remove());
  state.nodes.forEach((n, i) => {
    const tr = nt.insertRow();
    tr.insertCell().textContent = i;
    tr.insertCell().appendChild(numInput(n.x, (v) => { n.x = v; }));
    tr.insertCell().appendChild(numInput(n.y, (v) => { n.y = v; }));
    tr.insertCell().appendChild(checkbox(n.fixedX, (v) => { n.fixedX = v; }));
    tr.insertCell().appendChild(checkbox(n.fixedY, (v) => { n.fixedY = v; }));
    tr.insertCell().appendChild(numInput(n.fx, (v) => { n.fx = v; }));
    tr.insertCell().appendChild(numInput(n.fy || 0, (v) => { n.fy = v; }));
    tr.insertCell().appendChild(numInput(n.measuredUx, (v) => { n.measuredUx = v; }));
    // Payload (non-structural) mass — feeds "point_masses" and with it
    // every mass matrix of the dynamics family (ops/mass.py).
    tr.insertCell().appendChild(numInput(n.pm || 0, (v) => { n.pm = v; }));
    const del = document.createElement("button"); del.textContent = "✕";
    del.addEventListener("click", () => {
      state.nodes.splice(i, 1);
      state.elements = state.elements
        .filter(([a, b]) => a !== i && b !== i)
        .map(([a, b]) => [a > i ? a - 1 : a, b > i ? b - 1 : b]);
      state.displacements = null; save(); render();
    });
    tr.insertCell().appendChild(del);
  });

  const et = document.getElementById("elem-table");
  et.querySelectorAll("tr:not(:first-child)").forEach((r) => r.remove());
  state.elements.forEach((e, i) => {
    const tr = et.insertRow();
    tr.insertCell().textContent = i;
    tr.insertCell().textContent = e[0];
    tr.insertCell().textContent = e[1];
    const del = document.createElement("button"); del.textContent = "✕";
    del.addEventListener("click", () => {
      state.elements.splice(i, 1); state.displacements = null; save(); render();
    });
    tr.insertCell().appendChild(del);
  });

  const rt = document.getElementById("result-table");
  rt.querySelectorAll("tr:not(:first-child)").forEach((r) => r.remove());
  if (state.displacements) {
    state.nodes.forEach((n, i) => {
      const ux = state.displacements[2 * i] || 0;
      const uy = state.displacements[2 * i + 1] || 0;
      const tr = rt.insertRow();
      tr.insertCell().textContent = i;
      tr.insertCell().textContent = ux.toExponential(3);
      tr.insertCell().textContent = uy.toExponential(3);
      tr.insertCell().textContent = Math.hypot(ux, uy).toExponential(3);
    });
  }
}

// NN config table
const nnProps = ["young", "area", "density"];
const nnConfig = {};
(function initNN() {
  const table = document.getElementById("nn-table");
  for (const p of nnProps) {
    nnConfig[p] = { enabled: false, hidden_layers: 2,
                    neurons_per_layer: p === "young" ? 20 : (p === "area" ? 15 : 10),
                    input_dim: 3 };
    const tr = table.insertRow();
    tr.insertCell().textContent = p;
    tr.insertCell().appendChild(checkbox(false, (v) => { nnConfig[p].enabled = v; }));
    tr.insertCell().appendChild(numInput(2, (v) => { nnConfig[p].hidden_layers = v; }, 3));
    tr.insertCell().appendChild(
      numInput(nnConfig[p].neurons_per_layer,
               (v) => { nnConfig[p].neurons_per_layer = v; }, 3));
  }
})();

// ---------- solve ----------
function buildProblem() {
  const nodes = state.nodes.map((n) => ({
    x: n.x, y: n.y, fixed_x: !!n.fixedX, fixed_y: !!n.fixedY,
    measured_ux: n.measuredUx || 0,
  }));
  const loads = [];
  state.nodes.forEach((n) => { loads.push(n.fx || 0, n.fy || 0); });
  const solverType = document.getElementById("solver-type").value;
  const tol = parseFloat(document.getElementById("tol").value) || 1e-6;
  const maxit = parseInt(document.getElementById("maxit").value) || 5000;
  const problem = {
    nodes, elements: state.elements, loads,
    material: {
      young: parseFloat(document.getElementById("mat-young").value) || 1,
      area: parseFloat(document.getElementById("mat-area").value) || 1,
      density: parseFloat(document.getElementById("mat-density").value) || 1,
    },
    nn_config: nnConfig,
    pinn_config: {
      max_iterations: maxit, tolerance: tol,
      learning_rate_u: 0.01, learning_rate_theta: 0.001,
      alpha_physics: 1.0, alpha_data: 100.0,
      preconditioning: document.getElementById("precond").checked,
    },
    solver_config: { max_iterations: maxit, tolerance: tol },
  };
  if (solverType === "full-nr" || solverType === "gn") {
    problem.solver_type = "pinn-gd";
    problem.solver_config.method = solverType;
  } else {
    problem.solver_type = solverType;
  }
  // Payload masses: emitted only when some node carries one, so plain
  // sketches keep the exact payload-free POST body the golden fixtures
  // pin (tests/test_ui_contract.py).
  if (state.nodes.some((n) => n.pm)) {
    problem.point_masses = state.nodes.map((n) => n.pm || 0);
  }
  return problem;
}

async function calculate() {
  const status = document.getElementById("status");
  status.className = ""; status.textContent = "Solving on the JAX backend…";
  try {
    const resp = await fetch("/api/fem/solve-generic", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(buildProblem()),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "solve failed");
    const r = data.result;
    state.displacements = r.displacements;
    let msg = `Converged: ${r.converged} · history entries: ${r.iterations}`;
    const ident = document.getElementById("identified");
    ident.innerHTML = "";
    if (r.identified_properties) {
      const lines = [];
      for (const p of nnProps) {
        const ip = r.identified_properties[p];
        if (!ip) continue;
        if (ip.type === "scalar") { lines.push(`${p}: ${ip.value}`); continue; }
        const vals = ip.load_factor_variations
          ? ip.load_factor_variations["load_factor_1.0"].at_elements.values
          : ip.at_elements.values;
        lines.push(`${p} @ elements: [${vals.map((v) => v.toPrecision(4)).join(", ")}]`);
      }
      ident.innerHTML = "<h3>Identified properties</h3><div id='status'>" +
        lines.join("<br>") + "</div>";
    }
    status.className = "ok"; status.textContent = msg;
  } catch (e) {
    status.className = "err"; status.textContent = "Error: " + e.message;
  }
  render();
}

// ---------- dynamics (modal / buckling via the "analysis" block) ----------
const dyn = { shapes: null, omegas: null, mode: null, t0: 0 };

function showShape(idx) {
  dyn.mode = idx;
  state.displacements = dyn.shapes[idx];
  render();
  if (document.getElementById("animate").checked) animateShape();
}

function animateShape() {
  if (dyn.mode === null || !document.getElementById("animate").checked) return;
  // Rescale time so every mode oscillates at ~1 Hz on screen.
  const phase = Math.sin((performance.now() - dyn.t0) / 1000 * 2 * Math.PI);
  state.displacements = dyn.shapes[dyn.mode].map((v) => v * phase);
  draw();
  requestAnimationFrame(animateShape);
}

function renderModalTable(rows) {
  const mt = document.getElementById("modal-table");
  mt.querySelectorAll("tr:not(:first-child)").forEach((r) => r.remove());
  rows.forEach((row, i) => {
    const tr = mt.insertRow();
    tr.insertCell().textContent = i + 1;
    tr.insertCell().textContent = row.f;
    tr.insertCell().textContent = row.w;
    if (dyn.shapes && dyn.shapes[i]) {
      const btn = document.createElement("button");
      btn.textContent = "show";
      btn.addEventListener("click", () => showShape(i));
      tr.insertCell().appendChild(btn);
    } else {
      tr.insertCell();
    }
  });
}

async function runAnalysis(kind, analysis) {
  const status = document.getElementById("dyn-status");
  status.textContent = `Running ${kind} analysis…`;
  try {
    const problem = buildProblem();
    problem.analysis = analysis;
    const resp = await fetch(`/api/fem/${kind}`, {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || `${kind} failed`);
    const r = data.result;
    dyn.t0 = performance.now();
    if (kind === "modal") {
      dyn.shapes = r.mode_shapes || null;
      dyn.omegas = r.omegas;
      renderModalTable(r.frequencies_hz.map((f, i) => ({
        f: f.toPrecision(5), w: r.omegas[i].toPrecision(5),
      })));
      status.textContent =
        `Lowest frequency: ${r.frequencies_hz[0].toPrecision(5)} Hz`;
    } else {
      dyn.shapes = r.buckling_modes || null;
      dyn.omegas = r.load_factors.map(() => 1);
      renderModalTable(r.load_factors.map((lam, i) => ({
        f: lam === null ? "∞" : lam.toPrecision(5), w: "λ" + (i + 1),
      })));
      status.textContent = r.load_factors[0] === null
        ? "No destabilizing mode under this load pattern"
        : `Critical load factor: ${r.load_factors[0].toPrecision(5)}`;
    }
    if (dyn.shapes) showShape(0);
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("modal-btn").addEventListener("click", () =>
  runAnalysis("modal", { n_modes: 4, include_shapes: true }));
document.getElementById("buckling-btn").addEventListener("click", () =>
  runAnalysis("buckling", { n_modes: 4, include_shapes: true }));

async function runTransient() {
  const status = document.getElementById("dyn-status");
  // Probe the loaded DOFs (fall back to the last node's x).
  const probeNodes = state.nodes
    .map((n, i) => (n.fx ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Integrating…";
  try {
    const problem = buildProblem();
    problem.analysis = {
      type: "transient", dt: "auto", n_steps: 4000, record_every: 20,
      damping: [0.05, 0.0], probe_nodes: probeNodes,
      amplitude: { type: "step" },
    };
    const resp = await fetch("/api/fem/transient", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "transient failed");
    const r = data.result;
    drawTimeSeries(r.times, r.displacements);
    status.textContent = `Step response: ${r.n_steps} steps `
      + `(dt=${r.dt.toExponential(2)}), probes: nodes `
      + probeNodes.join(", ");
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

function drawTimeSeries(times, series) {
  const cv = document.getElementById("dyn-chart");
  cv.style.display = "block";
  const g = cv.getContext("2d");
  g.clearRect(0, 0, cv.width, cv.height);
  const cols = series[0].length;
  let lo = Infinity, hi = -Infinity;
  for (const row of series) for (const v of row) {
    if (v < lo) lo = v;
    if (v > hi) hi = v;
  }
  if (hi - lo < 1e-12) { hi = lo + 1; }
  const x = (i) => 4 + (cv.width - 8) * i / (times.length - 1);
  const y = (v) => cv.height - 6 - (cv.height - 12) * (v - lo) / (hi - lo);
  g.strokeStyle = "#2a3342";
  g.beginPath(); g.moveTo(4, y(0)); g.lineTo(cv.width - 4, y(0)); g.stroke();
  const colors = ["#4ea1ff", "#39c07f", "#e4b34a", "#e46a6a"];
  for (let c = 0; c < Math.min(cols, 4); c++) {
    g.strokeStyle = colors[c];
    g.lineWidth = 1.5;
    g.beginPath();
    series.forEach((row, i) => {
      if (i === 0) g.moveTo(x(i), y(row[c]));
      else g.lineTo(x(i), y(row[c]));
    });
    g.stroke();
  }
}

document.getElementById("transient-btn").addEventListener("click",
                                                          runTransient);

async function runQuake() {
  // Seismic demo: a sine ground acceleration shakes every support in x
  // (base_acceleration load spec, relative coordinates — the
  // time-history complement of the response-spectrum analysis); the
  // chart shows the probes' relative displacement.
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => ((n.fx || n.fy) ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Shaking the supports…";
  try {
    const problem = buildProblem();
    problem.analysis = {
      type: "transient", dt: "auto", n_steps: 4000, record_every: 20,
      damping: [0.05, 0.0], probe_nodes: probeNodes,
      load: { type: "base_acceleration",
              history: { type: "sine", frequency_hz: 0.05 },
              direction: [1, 0], scale: 1.0 },
    };
    const resp = await fetch("/api/fem/transient", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "transient failed");
    const r = data.result;
    drawTimeSeries(r.times, r.displacements);
    status.textContent = `Base excitation (${r.load_type}): ${r.n_steps} `
      + `steps (dt=${r.dt.toExponential(2)}); chart: displacement `
      + "RELATIVE to the ground at nodes " + probeNodes.join(", ");
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("quake-btn").addEventListener("click", runQuake);

async function runSpectrum() {
  // Spectrum-generation demo: the same synthetic quake record as the
  // Quake button, but run through the OTHER seismic workflow — the
  // record generates a response spectrum (vectorized SDOF sweep) that
  // drives the modal combination, evaluated exactly at the modal
  // frequencies. Chart: the generated PSa(ω) curve bracketing the
  // structure's modes.
  const status = document.getElementById("dyn-status");
  status.textContent = "Generating the response spectrum…";
  try {
    const problem = buildProblem();
    const modalResp = await fetch("/api/fem/modal", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ ...problem,
        analysis: { n_modes: 4, include_shapes: false } }),
    });
    const modal = await modalResp.json();
    if (!modal.success) throw new Error(modal.error || "modal failed");
    const om = modal.result.omegas;
    const w1 = om[0] || 1, wN = om[om.length - 1] || 2 * (om[0] || 1);
    problem.analysis = {
      type: "spectrum", direction: [1, 0], n_modes: 4,
      combination: "cqc", damping_ratio: 0.05,
      sa: { history: { type: "sine", frequency_hz: 0.05 },
            dt: 0.05, n_steps: 4000, damping_ratio: 0.05,
            curve_omegas: { start: 0.2 * w1, stop: 2.0 * wN,
                            num: 120 } },
    };
    const resp = await fetch("/api/fem/spectrum", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "spectrum failed");
    const r = data.result;
    const curve = r.spectrum_curve;
    drawTimeSeries(curve.omegas, curve.psa.map((v) => [v]));
    const fmt = (v) => Number(v).toPrecision(4);
    status.textContent =
      `Generated spectrum (${r.combination.toUpperCase()}): Sa at `
      + `modes [${r.sa_at_modes.map(fmt).join(", ")}], peak combined `
      + `|u| = ${fmt(Math.max(...r.displacements))}, modal mass `
      + `${(100 * r.mass_fraction).toFixed(1)}%; chart: PSa(ω)`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("spectrum-btn").addEventListener("click",
                                                         runSpectrum);

async function runSnap() {
  // Arc-length continuation (Riks): trace the CURRENT sketch's
  // equilibrium path lambda(u) THROUGH limit points — press "Load arch
  // demo" for the canonical von Mises snap-through. Chart: lambda and
  // the probe displacement (rescaled) per arc-length step.
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => ((n.fx || n.fy) ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Tracing the equilibrium path…";
  try {
    const problem = buildProblem();
    problem.analysis = {
      type: "continuation", n_steps: 400, initial_dlambda: 0.01,
      stop_lambda_abs: 0.5, probe_nodes: probeNodes,
    };
    const resp = await fetch("/api/fem/continuation", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "continuation failed");
    const r = data.result;
    const lam = r.load_factors;
    const u = r.displacements.map((row) => row[1] !== undefined
      ? row[1] : row[0]);                    // probe y DOF if present
    const lamMax = Math.max(...lam.map(Math.abs), 1e-12);
    const uMax = Math.max(...u.map(Math.abs), 1e-12);
    drawTimeSeries(lam.map((_, i) => i),
                   lam.map((l, i) => [l, u[i] * lamMax / uMax]));
    const fmt = (v) => Number(v).toPrecision(4);
    const fold = Math.max(...lam);
    status.textContent =
      `Equilibrium path: ${r.n_points} points, fold at λ = ${fmt(fold)}`
      + `, λ ∈ [${fmt(Math.min(...lam))}, ${fmt(fold)}]; chart: λ (and `
      + `scaled probe u) per arc-length step`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("snap-btn").addEventListener("click", runSnap);

async function runHarmonic() {
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => (n.fx ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Sweeping frequencies…";
  try {
    // Bracket the first resonances via a quick modal call.
    const problem = buildProblem();
    const mResp = await fetch("/api/fem/modal", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ ...problem,
                             analysis: { n_modes: 2,
                                         include_shapes: false } }),
    });
    const mData = await mResp.json();
    if (!mData.success) throw new Error(mData.error || "modal failed");
    const om = mData.result.omegas;
    const w1 = om[0] || 1, w2 = om[om.length - 1] || 2 * w1;
    problem.analysis = {
      type: "harmonic", damping: [0.05, 0.001],
      omegas: { start: 0.3 * w1, stop: 1.4 * w2, num: 200 },
      probe_nodes: probeNodes,
    };
    const resp = await fetch("/api/fem/harmonic", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "harmonic failed");
    const r = data.result;
    drawTimeSeries(r.omegas, r.amplitude);
    status.textContent = `|H(ω)| over ω ∈ [${(0.3 * w1).toPrecision(3)}, `
      + `${(1.4 * w2).toPrecision(3)}] rad/s; resonances at `
      + om.map((w) => w.toPrecision(4)).join(", ");
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}


document.getElementById("harmonic-btn").addEventListener("click",
                                                         runHarmonic);

async function runRandom() {
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => (n.fx ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Integrating response PSD\u2026";
  try {
    // Bracket the resonances so the omega grid resolves every peak.
    const problem = buildProblem();
    const mResp = await fetch("/api/fem/modal", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ ...problem,
                             analysis: { n_modes: 3,
                                         include_shapes: false } }),
    });
    const mData = await mResp.json();
    if (!mData.success) throw new Error(mData.error || "modal failed");
    const om = mData.result.omegas;
    const w1 = om[0] || 1, w2 = om[om.length - 1] || 2 * w1;
    // Member fatigue statistics (stress RMS, crossing rate, Davenport
    // expected peak over an hour) need no S-N constants — probe every
    // element (bounded; the payload guard caps PSD serialization).
    const nElm = state.elements.length;
    const probeElements = Array.from(
      { length: Math.min(nElm, 16) }, (_, i) => i);
    problem.analysis = {
      type: "random", psd: 1.0, damping: [0.05, 0.001],
      omegas: { start: 0.2 * w1, stop: 1.5 * w2, num: 400 },
      probe_nodes: probeNodes,
      probe_elements: probeElements,
      fatigue: { duration: 3600.0 },
    };
    const resp = await fetch("/api/fem/random", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "random failed");
    const r = data.result;
    drawTimeSeries(r.omegas, r.psd);
    const rms = r.rms.map((v) => v.toPrecision(4)).join(", ");
    let fatigueNote = "";
    if (r.fatigue) {
      const srms = r.fatigue.stress_rms;
      const worst = srms.indexOf(Math.max(...srms));
      fatigueNote =
        `; worst member e${r.fatigue.probe_elements[worst]}: ` +
        `σ_rms = ${srms[worst].toPrecision(3)}, ` +
        `ν₀ = ${r.fatigue.nu0_hz[worst].toPrecision(3)} Hz, ` +
        `1 h peak ≈ ` +
        `${r.fatigue.expected_peak_stress[worst].toPrecision(3)}`;
    }
    status.textContent =
      `Displacement PSD under unit white-noise load; RMS = [${rms}]` +
      fatigueNote;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("random-btn").addEventListener("click",
                                                       runRandom);

async function runReduction() {
  const status = document.getElementById("dyn-status");
  // Masters: the loaded nodes (fall back to the last node).
  const masterNodes = state.nodes
    .map((n, i) => ((n.fx || n.fy) ? i : -1)).filter((i) => i >= 0);
  if (!masterNodes.length && state.nodes.length) {
    masterNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Condensing (Craig-Bampton)\u2026";
  try {
    const problem = buildProblem();
    problem.analysis = {
      type: "reduction", method: "craig_bampton",
      master_nodes: masterNodes, n_modes: 4, compare_full: true,
    };
    const resp = await fetch("/api/fem/reduction", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "reduction failed");
    const r = data.result;
    dyn.shapes = null;
    renderModalTable(r.reduced_frequencies_hz.map((f, i) => ({
      f: f.toPrecision(5),
      w: r.frequency_rel_error && r.frequency_rel_error[i] !== undefined
        ? "err " + r.frequency_rel_error[i].toExponential(1)
        : "\u2014",
    })));
    status.textContent = `${r.method}: ${r.n_reduced_dofs} reduced DOFs `
      + `(masters: nodes ${masterNodes.join(", ")}), f1 = `
      + `${r.reduced_frequencies_hz[0].toPrecision(5)} Hz`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("reduction-btn").addEventListener("click",
                                                          runReduction);

async function runIdentify() {
  // Twin-data demo of time-domain identification: the server integrates
  // a "true" structure (E and rho scaled off the current material),
  // adds 1% noise, and recovers both by AD through the integrator —
  // density is invisible to every static method.
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => ((n.fx || n.fy) ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Identifying E, ρ from a noisy synthetic "
    + "trajectory…";
  try {
    const problem = buildProblem();
    const trueE = 1.6 * problem.material.young;
    const trueRho = 0.7 * (problem.material.density || 1.0);
    problem.analysis = {
      type: "identification", dt: "auto", n_steps: 800,
      params: ["young", "density"],
      synthetic: { young: trueE, density: trueRho, noise: 0.01, seed: 0 },
      probe_nodes: probeNodes, damping: [0.05, 0.0],
      n_iter: 300, learning_rate: 0.1, include_fit: false,
    };
    const resp = await fetch("/api/fem/identification", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "identification failed");
    const r = data.result;
    // Convergence trace: log10 loss vs iteration.
    drawTimeSeries(r.loss_history.map((_, i) => i),
                   r.loss_history.map((v) => [Math.log10(v + 1e-30)]));
    const fmt = (v) => Number(v).toPrecision(4);
    status.textContent =
      `Identified E = ${fmt(r.identified.young)} (true ${fmt(trueE)}), `
      + `ρ = ${fmt(r.identified.density)} (true ${fmt(trueRho)}) in `
      + `${r.n_iter} iters; chart: log10 loss`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("identify-btn").addEventListener("click",
                                                         runIdentify);

async function runIdentifyField() {
  // Field-mode demo: a linear stiffness gradient E(x) rising 50% across
  // the span is synthesized per element; the server recovers it as an
  // MLP field (the PINN NN-property parameterization) from the probe
  // nodes' transient histories, and the chart overlays both profiles
  // by element index.
  const status = document.getElementById("dyn-status");
  const probeNodes = state.nodes
    .map((n, i) => ((n.fx || n.fy) ? i : -1)).filter((i) => i >= 0);
  if (!probeNodes.length && state.nodes.length) {
    probeNodes.push(state.nodes.length - 1);
  }
  status.textContent = "Identifying the E(x) profile from transient "
    + "probe histories…";
  try {
    const problem = buildProblem();
    const xs = state.nodes.map((n) => n.x);
    const cx = state.elements.map(([i, j]) => 0.5 * (xs[i] + xs[j]));
    const xmin = Math.min(...cx);
    const span = Math.max(Math.max(...cx) - xmin, 1e-9);
    const e0 = problem.material.young;
    const trueE = cx.map((x) => e0 * (1 + 0.5 * (x - xmin) / span));
    problem.analysis = {
      type: "identification",
      field: { name: "young", hidden_layers: 1, neurons_per_layer: 8,
               seed: 0 },
      dt: "auto", n_steps: 600,
      synthetic: { young: trueE },
      probe_nodes: probeNodes, damping: [0.05, 0.0],
      n_iter: 600, learning_rate: 0.05, include_fit: false,
    };
    const resp = await fetch("/api/fem/identification", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "identification failed");
    const r = data.result;
    const fit = r.identified_field.at_elements.values;
    drawTimeSeries(cx.map((_, i) => i),
                   fit.map((v, i) => [trueE[i], v]));
    status.textContent =
      `Recovered E(x) over ${fit.length} elements — max element error `
      + `${(100 * r.field_max_rel_error).toFixed(1)}% in ${r.n_iter} `
      + `iters; chart: true vs identified profile by element`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("identify-field-btn").addEventListener(
  "click", runIdentifyField);

async function runOptimize() {
  // Sizing demo (the design-side inverse): minimum-mass member areas
  // under an allowable-stress limit of 5% of E (a strain allowable, so
  // the demo works whatever units the sketch uses). The chart shows the
  // augmented-Lagrangian loss; the status line the mass saving and the
  // governing stress ratio.
  const status = document.getElementById("dyn-status");
  status.textContent = "Sizing members for minimum mass…";
  try {
    const problem = buildProblem();
    const limit = 0.05 * problem.material.young;
    problem.analysis = {
      type: "sizing", stress_limit: limit,
      min_area: 1e-4 * (problem.material.area || 1.0),
      n_iter: 150, outer_rounds: 4, learning_rate: 0.08,
    };
    const resp = await fetch("/api/fem/sizing", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "sizing failed");
    const r = data.result;
    drawTimeSeries(r.history.map((_, i) => i),
                   r.history.map((v) => [Math.log10(v + 1e-30)]));
    const fmt = (v) => Number(v).toPrecision(4);
    const amin = Math.min(...r.areas);
    const amax = Math.max(...r.areas);
    status.textContent =
      `Mass ${fmt(r.mass_initial)} → ${fmt(r.mass)} `
      + `(${(100 * r.mass_reduction).toFixed(1)}% lighter); areas `
      + `${fmt(amin)}–${fmt(amax)}, max |σ|/σ_allow = `
      + `${fmt(r.max_stress_ratio)}; chart: log10 loss`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("optimize-btn").addEventListener("click",
                                                         runOptimize);

async function runReliability() {
  // FORM reliability demo (the assessment-side inverse): first a
  // statics solve fixes the mean-load stress level, then every member
  // gets a resistance drawn 30% above that level (lognormal, 10%
  // scatter) and the question becomes: with +/-20% load and 5%
  // stiffness scatter, how likely is ANY member to exceed it?  The
  // chart shows beta per member; the status line the critical member
  // and the series-system failure-probability bounds.
  const status = document.getElementById("dyn-status");
  status.textContent = "Assessing failure probability (FORM)…";
  try {
    const problem = buildProblem();
    // Mean-load stress level from the generic statics route (the same
    // path Calculate uses — the classic route's reference BC quirk
    // makes it unusable for sketches pinned via fixed_x + fixed_y),
    // with member stresses recovered client-side: eps = g·u_e / L².
    const sresp = await fetch("/api/fem/solve-generic", {
      method: "POST", headers: { "Content-Type": "application/json" },
      // Scalar-material statics: the demo's uncertainty model scatters
      // the SCALAR young, so an attached NN field is dropped here.
      body: JSON.stringify({ ...problem, analysis: undefined,
                             nn_config: undefined }),
    });
    const sdata = await sresp.json();
    if (!sdata.success) throw new Error(sdata.error || "statics failed");
    const u = sdata.result.displacements;
    const E = problem.material.young;
    const stresses = problem.elements.map(([i, j]) => {
      const dx = problem.nodes[j].x - problem.nodes[i].x;
      const dy = problem.nodes[j].y - problem.nodes[i].y;
      const l2 = dx * dx + dy * dy;
      const eps = ((u[2 * j] - u[2 * i]) * dx
                   + (u[2 * j + 1] - u[2 * i + 1]) * dy) / l2;
      return E * eps;
    });
    const smax = Math.max(...stresses.map(Math.abs));
    if (!(smax > 0)) throw new Error("no stressed members to assess");
    problem.analysis = {
      type: "reliability",
      variables: [
        { name: "E", kind: "young", distribution: "lognormal",
          mean: problem.material.young, cov: 0.05 },
        { name: "S", kind: "load_scale", distribution: "normal",
          mean: 1.0, std: 0.2 },
        { name: "R", kind: "resistance", distribution: "lognormal",
          mean: 1.3 * smax, cov: 0.1 },
      ],
      limit_state: { type: "stress", variable: "R" },
    };
    const resp = await fetch("/api/fem/reliability", {
      method: "POST", headers: { "Content-Type": "application/json" },
      body: JSON.stringify(problem),
    });
    const data = await resp.json();
    if (!data.success) throw new Error(data.error || "reliability failed");
    const r = data.result;
    drawTimeSeries(r.beta.map((_, i) => i),
                   r.beta.map((v) => [v === null ? 8 : Math.min(v, 8)])  // null = unreachable (infinitely safe): cap, not 0);
    const fmt = (v) => Number(v).toPrecision(3);
    const crit = r.critical_limit_state;
    const [lo, hi] = r.system_pf_bounds;
    status.textContent =
      `Min β = ${fmt(r.beta_min)} (pf ${r.pf[crit].toExponential(2)}, `
      + `${r.labels[crit]}); system pf ∈ [${lo.toExponential(2)}, `
      + `${hi.toExponential(2)}]; chart: β per member (capped at 8)`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}

document.getElementById("reliability-btn").addEventListener(
  "click", runReliability);

// ---------- wiring ----------
for (const m of ["select", "node", "element"]) {
  document.getElementById(`mode-${m}`).addEventListener("click", () => {
    state.mode = m; state.pendingElemNode = null;
    for (const mm of ["select", "node", "element"]) {
      document.getElementById(`mode-${mm}`).classList.toggle("active", mm === m);
    }
  });
}
document.getElementById("clear").addEventListener("click", () => {
  state.nodes = []; state.elements = []; state.displacements = null;
  save(); render();
});
document.getElementById("demo").addEventListener("click", () => {
  state.nodes = [
    { x: 0, y: 0, fixedX: true, fixedY: true, fx: 0, measuredUx: 0 },
    { x: 1, y: 0, fixedX: false, fixedY: true, fx: 0, measuredUx: 1 },
    { x: 2, y: 0, fixedX: false, fixedY: true, fx: 0, measuredUx: 2 },
    { x: 3, y: 0, fixedX: false, fixedY: true, fx: 1, measuredUx: 3 },
  ];
  state.elements = [[0, 1], [1, 2], [2, 3]];
  state.displacements = null; save(); render();
});
document.getElementById("demo-arch").addEventListener("click", () => {
  // The canonical von Mises snap-through arch (the dyn-continuation
  // corpus geometry: apex x pinned for symmetry): press Snap ▶ to
  // trace its path through both folds.
  state.nodes = [
    { x: 0, y: 0, fixedX: true, fixedY: true, fx: 0, measuredUx: 0 },
    { x: 1, y: 1, fixedX: true, fixedY: false, fx: 0, fy: -1,
      measuredUx: 0 },
    { x: 2, y: 0, fixedX: true, fixedY: true, fx: 0, measuredUx: 0 },
  ];
  state.elements = [[0, 1], [1, 2]];
  state.displacements = null; save(); render();
});
document.getElementById("defscale").addEventListener("input", (e) => {
  state.defScale = parseInt(e.target.value);
  document.getElementById("defscale-val").textContent = e.target.value;
  render();
});
document.getElementById("calc").addEventListener("click", calculate);

function render() { draw(); renderTables(); }
load(); render();

// ---- round-3 element families reach the UI tier (VERDICT r3 #1) ----

function frameDoc(problem, analysis) {
  // Reinterpret the truss sketch as a RIGID-JOINTED frame: same
  // geometry, solid-square section I = A^2/12, truss loads carried
  // over with zero nodal moments; fully-pinned sketch nodes become
  // clamps, partial fixities keep their translational DOF only
  // (the io/frame_io.py document contract; mirrors the React
  // DynamicsPanel frameDoc builder).
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
}

async function postDoc(kind, doc) {
  const resp = await fetch(`/api/fem/${kind}`, {
    method: "POST", headers: { "Content-Type": "application/json" },
    body: JSON.stringify(doc),
  });
  const data = await resp.json();
  if (!data.success) throw new Error(data.error || `${kind} failed`);
  return data.result;
}

async function runFrame() {
  const status = document.getElementById("dyn-status");
  status.textContent = "Solving the sketch as a rigid-jointed frame…";
  try {
    const problem = buildProblem();
    const s = await postDoc("frame", frameDoc(problem, { type: "static" }));
    const m = await postDoc("frame", frameDoc(problem,
      { type: "modal", n_modes: 4, include_shapes: true }));
    // Canvas overlays 2-DOF shapes: project out the rotation DOFs.
    dyn.shapes = m.mode_shapes.map((phi) =>
      phi.filter((_, d) => d % 3 !== 2));
    dyn.omegas = m.omegas;
    const aMax = Math.max(...s.axial_forces.map(Math.abs));
    const mMax = Math.max(...s.end_moments.flat().map(Math.abs));
    renderModalTable(m.frequencies_hz.map((f, i) => ({
      f: f.toPrecision(5), w: m.omegas[i].toPrecision(5),
    })));
    status.textContent = `Rigid joints carry moment: max |N| = `
      + `${aMax.toPrecision(4)}, max |M| = ${mMax.toPrecision(4)}; `
      + `f₁ = ${m.frequencies_hz[0].toPrecision(5)} Hz`;
    if (dyn.shapes) showShape(0);
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("frame-btn").addEventListener("click", runFrame);

async function runPlane() {
  const status = document.getElementById("dyn-status");
  status.textContent = "Solving the plane-stress cantilever patch…";
  try {
    const E = buildProblem().material.young;
    const r = await postDoc("plane", {
      mesh: { type: "rect", width: 4, height: 1, nx: 24, ny: 6,
              element: "quad" },
      material: { young: E, poisson: 0.3, thickness: 0.1, density: 1 },
      edge_loads: [{ nodes: [24, 49, 74, 99, 124, 149, 174],
                     traction: [0, -0.01 * E] }],
      fixed_nodes: [0, 25, 50, 75, 100, 125, 150],
      analysis: { type: "static" },
    });
    const uy = r.displacements.filter((_, d) => d % 2 === 1);
    const tip = Math.min(...uy);
    status.textContent = `End-loaded plane-stress cantilever (144 Q4): `
      + `tip ${tip.toPrecision(4)}, max von Mises `
      + `${r.max_von_mises.toPrecision(4)} (element `
      + `${r.max_von_mises_element})`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("plane-btn").addEventListener("click", runPlane);

function plateDoc(E) {
  // Canonical plate demo (pinned as tests/fixtures/ui_payload_plate
  // .json, byte-identical to the React panel's runPlate): hard-SS
  // Mindlin square under uniform pressure q = -0.001*E, t/a = 0.01 —
  // center deflection on the EXACT Mindlin/Navier series: w scales
  // 1/E, so |w_center| = 44.38 for ANY E with q = -0.001*E.
  return {
    mesh: { type: "rect", width: 1, height: 1, nx: 16, ny: 16 },
    material: { young: E, poisson: 0.3, thickness: 0.01, density: 1 },
    pressure: -0.001 * E,
    supports: { simply_supported: ["left", "right", "bottom", "top"] },
    analysis: { type: "static" },
  };
}

async function runPlate() {
  const status = document.getElementById("dyn-status");
  status.textContent = "Bending the Mindlin plate…";
  try {
    const E = buildProblem().material.young;
    const r = await postDoc("plate", plateDoc(E));
    // Chart: deflection profile along the center line y = a/2
    // (mesh row j = 8 of the 17x17 grid: nodes 136..152).
    const xs = [];
    const w = [];
    for (let i = 0; i <= 16; i++) {
      xs.push(i / 16);
      w.push([r.displacements[3 * (8 * 17 + i)]]);
    }
    drawTimeSeries(xs, w);
    status.textContent = `Mindlin SS plate (16x16 MITC4 Q4, t/a=0.01): `
      + `center w ${r.max_deflection.toPrecision(4)} `
      + `(exact Mindlin series 44.38, any E), `
      + `extreme-fiber von Mises ${r.max_von_mises.toPrecision(4)}`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("plate-btn").addEventListener("click", runPlate);

function plateIdentDoc(E) {
  // Slab damage localization demo (pinned as tests/fixtures/
  // ui_payload_plate_identify.json): the softened left half (0.6E)
  // and stiffened right half (1.2E) of an 8x8 SS slab recovered from
  // 12 probe deflections by the banded-adjoint zone identification
  // (io/plate_io.py identification contract; synthetic twin data).
  return {
    mesh: { type: "rect", width: 1, height: 1, nx: 8, ny: 8 },
    material: { young: E, poisson: 0.3, thickness: 0.1, density: 1 },
    pressure: -0.001 * E,
    supports: { simply_supported: ["left", "right", "bottom", "top"] },
    analysis: {
      type: "identification",
      zones: [{ x_max: 0.5 }, { x_min: 0.5 }],
      synthetic: { zone_young: [0.6 * E, 1.2 * E] },
      probe_nodes: [10, 20, 30, 40, 50, 60, 70, 22, 58, 44, 36, 48],
      n_iter: 120,
      learning_rate: 0.2,
      tolerance: 1e-8,
    },
  };
}

async function runPlateIdent() {
  const status = document.getElementById("dyn-status");
  status.textContent = "Localizing the slab damage (banded adjoint)…";
  try {
    const E = buildProblem().material.young;
    const r = await postDoc("plate", plateIdentDoc(E));
    // Chart: log10 loss history — the ADAM convergence trace.
    const xs = [];
    const logLoss = [];
    for (let i = 0; i < r.loss_history.length; i++) {
      xs.push(i);
      logLoss.push([Math.log10(Math.max(r.loss_history[i], 1e-300))]);
    }
    drawTimeSeries(xs, logLoss);
    const ze = r.zone_young.map((v) => (v / E).toPrecision(4));
    status.textContent = `Slab damage localized (8x8 MITC4, banded `
      + `adjoint, 12 probes): zone E/E0 [${ze.join(", ")}] `
      + `(true [0.6, 1.2]), max zone error `
      + `${Math.max(...r.zone_rel_error).toExponential(2)}`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("plate-ident-btn")
  .addEventListener("click", runPlateIdent);

function solidDoc(E) {
  // Canonical 3D demo (pinned as tests/fixtures/ui_payload_solid.json,
  // byte-identical to the React panel's runSolid): uniaxial box column
  // with symmetry supports — closed form u_z = 0.05*E*4/E = 0.2,
  // von Mises = 0.05*E everywhere (models/solid.py anchors).
  return {
    mesh: { type: "box", lx: 1, ly: 1, lz: 4, nx: 2, ny: 2, nz: 8 },
    material: { young: E, poisson: 0.3, density: 1 },
    fixed_z_nodes: "z_min",
    fixed_x_nodes: "x_min",
    fixed_y_nodes: "y_min",
    surface_loads: [{ face: "z_max", traction: [0, 0, 0.05 * E] }],
    analysis: { type: "static" },
  };
}

async function runSolid() {
  const status = document.getElementById("dyn-status");
  status.textContent = "Solving the 3D hex8 column…";
  try {
    const E = buildProblem().material.young;
    const r = await postDoc("solid", solidDoc(E));
    status.textContent = `3D hex8 column (2x2x8 box, uniaxial): `
      + `max |u| ${r.max_displacement.toPrecision(4)} `
      + `(closed form 0.2000), von Mises `
      + `${r.max_von_mises.toPrecision(4)} (exact 0.05·E)`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("solid-btn").addEventListener("click", runSolid);

async function runSolidPlastic() {
  // 3D J2 bilinear column (pinned as
  // tests/fixtures/ui_payload_solid_plastic.json, byte-identical to
  // the React panel's runSolidPlastic): free lateral contraction
  // makes 3D von Mises reproduce the 1D bilinear law EXACTLY, so the
  // endpoint tip u_z = L(σ/E + (σ−σ_y)/H) = 0.065 and the capacity
  // curve kinks at σ_y = 1 (ops/solid_plastic.py anchors).
  const status = document.getElementById("dyn-status");
  status.textContent = "Yielding the 3D hex8 column…";
  try {
    const r = await postDoc("solid", {
      mesh: { type: "box", lx: 1, ly: 1, lz: 2, nx: 2, ny: 2, nz: 6 },
      material: { young: 200, poisson: 0.3, density: 2 },
      fixed_z_nodes: "z_min",
      fixed_x_nodes: "x_min",
      fixed_y_nodes: "y_min",
      surface_loads: [{ face: "z_max", traction: [0, 0, 1.5] }],
      analysis: {
        type: "plastic", sigma_y: 1, hardening: 20,
        load_factors: [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1],
        tolerance: 1e-10, probe_nodes: "z_max",
      },
    });
    // Chart: mean tip z displacement (every 3rd probe DOF) vs load.
    const tipZ = r.displacements.map((row) => {
      const zs = row.filter((_, d) => d % 3 === 2);
      return [zs.reduce((a, b) => a + b, 0) / zs.length];
    });
    drawTimeSeries(r.load_factors, tipZ);
    const uEnd = tipZ[tipZ.length - 1][0];
    status.textContent = `3D J2 bilinear column: tip `
      + `${uEnd.toPrecision(4)} (exact 0.065), `
      + `${r.yielded_elements.length}/24 elements yielded; `
      + `chart: capacity curve (kink at σ_y)`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("solid-plastic-btn")
  .addEventListener("click", runSolidPlastic);

async function runPushover() {
  // Elastoplastic pushover of the sketch: yield at 80% of the
  // mean-load elastic stress, ramp to 3x — capacity curve at the
  // loaded nodes (mirrors the React runPushover two-step flow).
  const status = document.getElementById("dyn-status");
  status.textContent = "Pushing over (elastoplastic)…";
  try {
    const problem = buildProblem();
    const probeNodes = state.nodes
      .map((n, i) => (n.fx || n.fy ? i : -1)).filter((i) => i >= 0);
    if (!probeNodes.length && state.nodes.length) {
      probeNodes.push(state.nodes.length - 1);
    }
    const s = await postDoc("solve-generic",
                            { ...problem, analysis: undefined,
                              nn_config: undefined });
    const u = s.displacements;
    const E = problem.material.young;
    const stresses = problem.elements.map(([i, j]) => {
      const dx = problem.nodes[j].x - problem.nodes[i].x;
      const dy = problem.nodes[j].y - problem.nodes[i].y;
      const l2 = dx * dx + dy * dy;
      const eps = ((u[2 * j] - u[2 * i]) * dx
                   + (u[2 * j + 1] - u[2 * i + 1]) * dy) / l2;
      return E * eps;
    });
    const smax = Math.max(...stresses.map(Math.abs));
    if (!(smax > 0)) throw new Error("no stressed members to push");
    const nSteps = 24;
    problem.analysis = {
      type: "plastic", sigma_y: 0.8 * smax, hardening: 0.05 * E,
      load_factors: Array.from({ length: nSteps },
                               (_, i) => 3.0 * (i + 1) / nSteps),
      probe_nodes: probeNodes,
    };
    // Scalar-material pushover (an attached NN young field is
    // dropped — yield vs stress needs the scalar value).
    const r = await postDoc("plastic", { ...problem,
                                         nn_config: undefined });
    drawTimeSeries(r.load_factors, r.displacements);
    status.textContent = `Pushover to 3× (yield at 0.8σ_max): `
      + `${r.yielded_elements.length} members yielded; chart: capacity `
      + `curve at nodes ${probeNodes.join(", ")}`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("pushover-btn").addEventListener("click",
                                                         runPushover);

async function runSlab() {
  // Layered elastoplastic one-way slab strip (pinned as
  // tests/fixtures/ui_payload_slab.json, byte-identical to the React
  // panel's runSlab): SS 8×1 strip, ν=0, pressure = the beam-mechanism
  // limit q_u = 8·Mp/L², ramped to 0.95 q_u — yield spreads from the
  // midspan extreme fibers through 20 plane-stress J2 layers and the
  // capacity curve softens (solvers/plate_plasticity.py).
  const status = document.getElementById("dyn-status");
  status.textContent = "Pushing the slab strip toward its mechanism…";
  try {
    const r = await postDoc("plate", {
      mesh: { type: "rect", width: 8, height: 1, nx: 16, ny: 1 },
      material: { young: 200000, poisson: 0, thickness: 0.1,
                  density: 1 },
      pressure: 0.09375,
      supports: { simply_supported: ["left", "right"] },
      analysis: { type: "plastic", sigma_y: 300, n_layers: 20,
                  load_factors: [0.2, 0.4, 0.6, 0.7, 0.8, 0.85, 0.9,
                                 0.95],
                  probe_nodes: [8, 25] },
    });
    drawTimeSeries(r.load_factors,
                   r.displacements.map((row) => [row[0]]));
    status.textContent = `One-way slab at 0.95 q_u (= 8Mp/L²): `
      + `${r.yielded_elements.length}/16 elements yielded through `
      + `${r.n_layers} layers, fiber von Mises pinned at `
      + `${Math.max(...r.max_von_mises).toPrecision(4)}; `
      + `chart: midspan capacity curve`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("slab-btn").addEventListener("click", runSlab);

function portalDoc() {
  // Plastic-hinge pushover of the canonical rectangular portal
  // (pinned as tests/fixtures/ui_payload_portal.json, byte-identical
  // to the React panel's runPortal): columns h=3, beam 4, uniform
  // Mp=500, unit sway load — EPP bending hinges at ±Mp, ramped
  // hinge-by-hinge to the EXACT plastic-theory sway mechanism
  // λ_c = 4·Mp/h = 666.67 (solvers/frame_plastic.py).
  return {
    nodes: [[0, 0], [0, 3], [4, 3], [4, 0]],
    elements: [[0, 1], [1, 2], [2, 3]],
    material: { young: 2e11, area: 0.01, inertia: 1e-4, density: 7850 },
    loads: [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    fixed_nodes: [0, 3],
    analysis: { type: "plastic", plastic_moment: 500,
                probe_nodes: [1] },
  };
}

async function runPortal() {
  // Frame hinge pushover: capacity curve λ vs sway, hinge sequence.
  const status = document.getElementById("dyn-status");
  status.textContent = "Pushing the portal frame to collapse…";
  try {
    const r = await postDoc("frame", portalDoc());
    // displacements rows: probe node 1's (u_x, u_y, θ) per event —
    // the chart is the sway capacity curve.
    drawTimeSeries(r.load_factors,
                   r.displacements.map((row) => [row[0]]));
    const seq = r.hinges.map((h) =>
      `m${h.member}${h.end ? "j" : "i"}@${h.load_factor.toPrecision(4)}`)
      .join(", ");
    status.textContent = r.mechanism
      ? `Portal sway mechanism at λ = `
        + `${r.collapse_factor.toPrecision(6)} (exact 4·Mp/h = 666.667)`
        + `; hinges: ${seq}; chart: capacity curve`
      : `No mechanism up to λ = `
        + `${r.load_factors[r.load_factors.length - 1].toPrecision(6)}`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("portal-btn").addEventListener("click",
                                                       runPortal);

function grillageDoc() {
  // 3D space-frame grillage FRF (pinned as
  // tests/fixtures/ui_payload_grillage.json, byte-identical to the
  // React panel's runGrillage): right-angle grillage, leg AB along X
  // clamped at A, leg BC along Y, unit vertical load at C.  The
  // harmonic ω→0 limit IS the exact static closed form
  // |w_C| = PL₁³/3EIy + PL₂³/3EIy + PL₂²L₁/GJ = 7.91667
  // (models/frame3d.py) — torsion-bending coupling no 2D family has.
  return {
    nodes: [[0, 0, 0], [3, 0, 0], [3, 2, 0]],
    elements: [[0, 1], [1, 2]],
    material: { young: 200, shear_modulus: 80, area: 1,
                inertia_y: 0.02, inertia_z: 0.05, torsion: 0.03,
                density: 1.2 },
    loads: [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
            0, 0, -1, 0, 0, 0],
    fixed_nodes: [0],
    analysis: { type: "harmonic",
                omegas: { start: 1e-6, stop: 1.0, num: 120 },
                damping: [0.005, 0.005], probe_dofs: [14] },
  };
}

async function runGrillage() {
  // 3D grillage tip FRF: chart |X|(ω), static limit + resonance.
  const status = document.getElementById("dyn-status");
  status.textContent = "Sweeping the 3D grillage tip FRF…";
  try {
    const r = await postDoc("frame3d", grillageDoc());
    const amp = r.amplitude.map((row) => row[0]);
    drawTimeSeries(r.omegas, amp.map((a) => [a]));
    let peak = 1;
    for (let i = 1; i + 1 < amp.length; i += 1) {
      if (amp[i] > amp[i - 1] && amp[i] > amp[i + 1]
          && amp[i] > amp[peak]) peak = i;
    }
    status.textContent = `3D grillage FRF: static limit |w_C| = `
      + `${amp[0].toPrecision(6)} (exact 7.91667); resonance at `
      + `ω ≈ ${r.omegas[peak].toPrecision(4)} rad/s; chart: tip FRF`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("grillage-btn").addEventListener("click",
                                                         runGrillage);

function roofDoc() {
  // Scordelis-Lo barrel roof (pinned as
  // tests/fixtures/ui_payload_roof.json, byte-identical to the React
  // panel's runRoof): the shell obstacle-course case — R=25, L=50,
  // 40° half-angle, t=0.25, self-weight 90/area, end diaphragms.
  // 16×16 facets put the midside free-edge deflection at −0.29514
  // vs the published 0.3024 (models/shell.py).
  const mid = [];
  for (let i = 0; i <= 16; i += 1) mid.push(8 * 17 + i);
  return {
    mesh: { type: "cylinder_panel", radius: 25, length: 50,
            half_angle_deg: 40, nx: 16, ny: 16 },
    material: { young: 4.32e8, poisson: 0, thickness: 0.25,
                density: 1 },
    supports: [{ nodes: "y_min", dofs: [0, 2] },
               { nodes: "y_max", dofs: [0, 2] },
               // one u_y pin removes the axial rigid mode the
               // diaphragms leave free (solution unchanged)
               { nodes: [0], dofs: [1] }],
    body_force: [0, 0, -90],
    analysis: { type: "static", probe_nodes: mid },
  };
}

async function runRoof() {
  // Shell obstacle course: midspan w profile across the arc.
  const status = document.getElementById("dyn-status");
  status.textContent = "Solving the Scordelis-Lo roof…";
  try {
    const r = await postDoc("shell", roofDoc());
    const w = [];
    for (let i = 0; i <= 16; i += 1) {
      w.push(r.probe_displacements[6 * i + 2]);
    }
    const arc = w.map((_, i) => -40 + 5 * i);
    drawTimeSeries(arc, w.map((v) => [v]));
    status.textContent = `Scordelis-Lo roof: free-edge w = `
      + `${w[16].toPrecision(6)} (target -0.3024, faceted 16x16 `
      + `-0.29514); crown w = ${w[8].toPrecision(4)}; chart: midspan `
      + `arc profile`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("roof-btn").addEventListener("click",
                                                     runRoof);

function shellPlasticDoc() {
  // Layered elastoplastic shell strip under COMBINED membrane
  // tension + bending (pinned as
  // tests/fixtures/ui_payload_shell_plastic.json, byte-identical to
  // the React panel's runShellPlastic): clamped 4×1 flat-facet strip
  // with an axial force at n = N/(σ_y t) = 0.5 and a right-edge
  // moment ramped proportionally to the rectangular-section
  // interaction capacity m = M/Mp = 1 − n² = 0.75 — the N-M coupling
  // (eps(z) = eps_m + z·κ shifts the neutral axis) no uncoupled
  // family reproduces (ops/shell_plastic.py).
  return {
    nodes: [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0], [4, 0, 0],
            [0, 1, 0], [1, 1, 0], [2, 1, 0], [3, 1, 0], [4, 1, 0]],
    elements: [[0, 1, 6, 5], [1, 2, 7, 6], [2, 3, 8, 7],
               [3, 4, 9, 8]],
    material: { young: 200000, poisson: 0, thickness: 0.1,
                density: 1 },
    supports: [{ nodes: "x_min", dofs: [0, 1, 2, 3, 4, 5] }],
    point_loads: [[4, 0, 7.5], [9, 0, 7.5],
                  [4, 4, -0.28125], [9, 4, -0.28125]],
    analysis: { type: "plastic", sigma_y: 300, n_layers: 20,
                load_factors: [0.2, 0.4, 0.6, 0.8, 0.9, 1.0],
                probe_nodes: [4] },
  };
}

async function runShellPlastic() {
  // N-M interaction capacity curve: tip rotation vs load factor.
  const status = document.getElementById("dyn-status");
  status.textContent = "Ramping the shell strip to its N-M capacity…";
  try {
    const r = await postDoc("shell", shellPlasticDoc());
    // probe_displacements rows: 6 DOFs of node 4; θ_y is index 4.
    drawTimeSeries(r.load_factors,
                   r.displacements.map((row) => [Math.abs(row[4])]));
    const nXX = r.final.membrane_forces[0][0];
    status.textContent = `Shell strip at the interaction capacity `
      + `m = 1 − n² (n = 0.5): ${r.yielded_elements.length}/4 facets `
      + `yielded through ${r.n_layers} layers, N = `
      + `${nXX.toPrecision(4)} (= 0.5 σ_y t), fiber von Mises pinned `
      + `at ${Math.max(...r.max_von_mises).toPrecision(4)}; `
      + `chart: tip-rotation capacity curve`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("shell-plastic-btn").addEventListener(
  "click", runShellPlastic);

function snapArchDoc() {
  // Shallow half-sine arch snap-through (pinned as
  // tests/fixtures/ui_payload_snap_arch.json, byte-identical to the
  // React panel's runSnapArch): rise e = 1.5t over L = 4 with the
  // server-built half-sine load — the continuum path is the EXACT
  // single-mode cubic λ(a) = −(Dk⁴a + EAk⁴(ea/2 + a²/4)(e + a)),
  // upper limit ≈ 2.8944 per unit width, traced through BOTH folds
  // by arc length (solvers/shell_nonlinear.py).
  const fixed = [];
  for (const nd of [0, 32, 33, 65]) {
    for (const d of [0, 1, 2]) fixed.push(6 * nd + d);
  }
  for (let nd = 0; nd < 66; nd += 1) fixed.push(6 * nd + 3);
  fixed.sort((a, b) => a - b);
  return {
    mesh: { type: "arch_strip", length: 4, width: 1, rise: 0.15,
            nx: 32 },
    material: { young: 200000, poisson: 0, thickness: 0.1,
                density: 1 },
    sine_load: 1,
    fixed_dofs: fixed,
    analysis: { type: "continuation", n_steps: 60, dl0: 0.02,
                max_dl: 0.08, tolerance: 1e-9, probe_nodes: [16] },
  };
}

async function runSnapArch() {
  // λ vs midspan deflection through both folds.
  const status = document.getElementById("dyn-status");
  status.textContent = "Tracing the arch through its snap…";
  try {
    const r = await postDoc("shell", snapArchDoc());
    const w = r.displacements.map((row) => -row[2]);
    drawTimeSeries(w, r.load_factors.map((v) => [v]));
    let lim = -Infinity;
    for (let i = 0; i < w.length; i += 1) {
      if (w[i] < 0.15 && r.load_factors[i] > lim) {
        lim = r.load_factors[i];
      }
    }
    status.textContent = `Arch snap-through: limit λ = `
      + `${lim.toPrecision(5)} (exact single-mode cubic 2.8944), `
      + `λ_min = ${Math.min(...r.load_factors).toPrecision(4)} on `
      + `the unstable branch; chart: λ vs midspan deflection `
      + `through both folds`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("snap-arch-btn").addEventListener(
  "click", runSnapArch);

async function runCylinder() {
  // Thick-wall von Mises cylinder at 99% of the textbook limit
  // pressure p_lim = (2/sqrt3) sigma_y ln(b/a): B-bar plane strain,
  // the plastic front spreading from the bore.
  const status = document.getElementById("dyn-status");
  status.textContent = "Pressurizing the thick-wall cylinder…";
  try {
    const plim = (2 / Math.sqrt(3)) * Math.log(2);
    const r = await postDoc("plane", {
      mesh: { type: "annulus", r_inner: 1, r_outer: 2, nr: 6, nt: 8 },
      material: { young: 1000, poisson: 0.3, thickness: 1, density: 1 },
      plane_strain: true,
      edge_loads: [{ nodes: [0, 7, 14, 21, 28, 35, 42, 49, 56],
                     pressure: 1 }],
      fixed_y_nodes: [0, 1, 2, 3, 4, 5, 6],
      fixed_x_nodes: [56, 57, 58, 59, 60, 61, 62],
      analysis: { type: "plastic", sigma_y: 1,
                  load_factors: [0.5 * plim, 0.9 * plim, 0.99 * plim],
                  tolerance: 1e-8, max_iterations: 40,
                  probe_nodes: [0] },
    });
    drawTimeSeries(r.load_factors,
                   r.displacements.map((row) => [row[0]]));
    status.textContent = `Von Mises cylinder at 0.99 p_lim: `
      + `${r.n_plastic[r.n_plastic.length - 1]}/48 elements plastic, `
      + `peak vM ${Math.max(...r.max_von_mises).toPrecision(4)}; `
      + `chart: bore displacement vs pressure`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("cylinder-btn").addEventListener("click",
                                                         runCylinder);

async function runShakedown() {
  // Explicit elastoplastic transient (POST body pinned as
  // tests/fixtures/ui_payload_plastic_transient.json, byte-identical
  // to the React panel's runShakedown): quasi-static trapezoid ramp
  // of the uniaxial strip to sigma = 16 > sigma_y = 12, unload,
  // settle — the residual state is the exact closed form
  // alpha = (16-12)/H = 0.2, tip u_x = W*alpha = 0.8
  // (solvers/continuum_transient_plastic.py).
  const status = document.getElementById("dyn-status");
  status.textContent = "Ramping the strip past yield…";
  try {
    const r = await postDoc("plane", {
      mesh: { type: "rect", width: 4, height: 2, nx: 2, ny: 1,
              element: "quad" },
      material: { young: 200, poisson: 0.3, thickness: 0.5,
                  density: 2 },
      fixed_x_nodes: "left",
      fixed_y_nodes: "bottom",
      edge_loads: [{ nodes: "right", traction: [16, 0] }],
      analysis: {
        type: "transient", dt: "auto", n_steps: 4000,
        record_every: 100, damping: [1.5, 0],
        amplitude: { type: "trapezoid", t_rise: 200, t_hold: 50,
                     t_fall: 200 },
        probe_nodes: "right",
        plasticity: { sigma_y: 12, hardening: 20 },
      },
    });
    // Chart: mean tip x displacement (even probe DOFs) — loads,
    // yields, unloads onto the 0.8 residual plateau.
    const tipX = r.displacements.map((row) => {
      const xs = row.filter((_, d) => d % 2 === 0);
      return [xs.reduce((a, b) => a + b, 0) / xs.length];
    });
    drawTimeSeries(r.times, tipX);
    const alpha = r.final.eq_plastic_strain;
    const mean = alpha.reduce((a, b) => a + b, 0) / alpha.length;
    status.textContent = `Elastoplastic shakedown: residual tip `
      + `${tipX[tipX.length - 1][0].toPrecision(4)} (exact 0.8), `
      + `eq. plastic strain ${mean.toPrecision(4)} (exact 0.2), `
      + `plastic work ${r.plastic_work[r.plastic_work.length - 1]
          .toPrecision(4)}`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("shakedown-btn").addEventListener("click",
                                                          runShakedown);

async function runQuakeWall() {
  // Seismic response spectrum of a plane-stress shear wall (POST body
  // pinned as tests/fixtures/ui_payload_plane_spectrum.json,
  // byte-identical to the React panel's runQuakeWall): flat design
  // spectrum Sa = 2.5 in x, CQC at 5% damping — the dyn-plane-spectrum
  // corpus problem (solvers/continuum_spectrum.py).
  const status = document.getElementById("dyn-status");
  status.textContent = "Shaking the shear wall…";
  try {
    const r = await postDoc("plane", {
      mesh: { type: "rect", width: 4, height: 8, nx: 4, ny: 8,
              element: "quad" },
      material: { young: 200, poisson: 0.3, thickness: 0.5,
                  density: 2 },
      fixed_nodes: "bottom",
      analysis: {
        type: "spectrum", sa: 2.5, direction: [1, 0], n_modes: 6,
        combination: "cqc", damping_ratio: 0.05,
      },
    });
    // Chart: per-mode effective-mass fractions (the completeness
    // check codes require ~90% of).
    const total = r.effective_mass.reduce((a, b) => a + b, 0)
      / r.mass_fraction;
    drawTimeSeries(r.omegas,
                   r.effective_mass.map((m) => [m / total]));
    status.textContent = `Shear-wall CQC spectrum: peak |u| `
      + `${r.max_displacement.toPrecision(4)}, peak von Mises `
      + `${r.max_von_mises.toPrecision(4)}, modal mass `
      + `${(100 * r.mass_fraction).toFixed(1)}% in 6 modes; `
      + `chart: effective mass per mode`;
  } catch (e) {
    status.textContent = "Error: " + e.message;
  }
}
document.getElementById("quake-wall-btn").addEventListener("click",
                                                           runQuakeWall);
