// App shell: model state, persistence, solve orchestration.
//
// Capability parity with the reference frontend shell
// (/root/reference/frontend/src/App.jsx): nodes/elements/NN-config state
// persisted to localStorage, problem assembly from per-node BCs/loads/
// measurements, POST /api/fem/solve-generic, per-node displacement
// unpacking and identified-property display.

import { useCallback, useEffect, useState } from 'react';
import FEMCanvas from './components/FEMCanvas.jsx';
import DataTable from './components/DataTable.jsx';
import PropertiesPanel from './components/PropertiesPanel.jsx';
import CalculateButton from './components/CalculateButton.jsx';
import DynamicsPanel from './components/DynamicsPanel.jsx';

const STORAGE_KEY = 'pinn_fem_tpu_model';

const DEFAULT_NN = {
  young: { enabled: false, hidden_layers: 2, neurons_per_layer: 20, input_dim: 3 },
  area: { enabled: false, hidden_layers: 2, neurons_per_layer: 15, input_dim: 3 },
  density: { enabled: false, hidden_layers: 2, neurons_per_layer: 10, input_dim: 3 },
};

export default function App() {
  const [nodes, setNodes] = useState([]);
  const [elements, setElements] = useState([]);
  const [material, setMaterial] = useState({ young: 1.0, area: 1.0, density: 1.0 });
  const [nnConfig, setNnConfig] = useState(DEFAULT_NN);
  const [selectedNode, setSelectedNode] = useState(null);
  const [selectedElement, setSelectedElement] = useState(null);
  const [results, setResults] = useState(null);
  const [shapeOverlay, setShapeOverlay] = useState(null);
  const [status, setStatus] = useState('');
  const [solving, setSolving] = useState(false);

  // Load persisted model once.
  useEffect(() => {
    try {
      const raw = localStorage.getItem(STORAGE_KEY);
      if (raw) {
        const saved = JSON.parse(raw);
        setNodes(saved.nodes ?? []);
        setElements(saved.elements ?? []);
        setMaterial(saved.material ?? { young: 1, area: 1, density: 1 });
        setNnConfig(saved.nnConfig ?? DEFAULT_NN);
      }
    } catch { /* fresh start */ }
  }, []);

  // Persist on change.
  useEffect(() => {
    localStorage.setItem(
      STORAGE_KEY,
      JSON.stringify({ nodes, elements, material, nnConfig }),
    );
  }, [nodes, elements, material, nnConfig]);

  const buildProblem = useCallback((solverOptions) => {
    const problemNodes = nodes.map((n) => ({
      x: n.x,
      y: n.y,
      fixed_x: !!n.fixedX,
      fixed_y: !!n.fixedY,
      measured_ux: n.measuredUx || 0,
      measured_uy: n.measuredUy || 0,
    }));
    const loads = [];
    for (const n of nodes) loads.push(n.fx || 0, n.fy || 0);

    const { solverType, tolerance, maxIterations, preconditioning } = solverOptions;
    const problem = {
      nodes: problemNodes,
      elements,
      loads,
      material,
      nn_config: nnConfig,
      pinn_config: {
        max_iterations: maxIterations,
        tolerance,
        learning_rate_u: 0.01,
        learning_rate_theta: 0.001,
        alpha_physics: 1.0,
        alpha_data: 100.0,
        preconditioning,
      },
      solver_config: { max_iterations: maxIterations, tolerance },
    };
    if (solverType === 'full-nr' || solverType === 'gn') {
      problem.solver_type = 'pinn-gd';
      problem.solver_config.method = solverType;
    } else {
      problem.solver_type = solverType;
    }
    return problem;
  }, [nodes, elements, material, nnConfig]);

  const handleCalculate = useCallback(async (solverOptions) => {
    setSolving(true);
    setStatus('Solving on the JAX backend…');
    try {
      const resp = await fetch('/api/fem/solve-generic', {
        method: 'POST',
        headers: { 'Content-Type': 'application/json' },
        body: JSON.stringify(buildProblem(solverOptions)),
      });
      const data = await resp.json();
      if (!data.success) throw new Error(data.error || 'solve failed');
      setShapeOverlay(null);
      setResults(data.result);
      setStatus(
        `Converged: ${data.result.converged} · history entries: ${data.result.iterations}`,
      );
    } catch (e) {
      setResults(null);
      setStatus(`Error: ${e.message}`);
    } finally {
      setSolving(false);
    }
  }, [buildProblem]);

  const clearModel = () => {
    setNodes([]);
    setElements([]);
    setResults(null);
    setShapeOverlay(null);
    setSelectedNode(null);
    setSelectedElement(null);
  };

  return (
    <div className="app">
      <header>
        <h1>PINN-FEM-TPU</h1>
        <span>truss CAD · classic FEM · PINN material identification</span>
        <button onClick={clearModel}>Clear model</button>
      </header>
      <main>
        <section className="canvas-panel">
          <FEMCanvas
            nodes={nodes}
            elements={elements}
            displacements={shapeOverlay ?? results?.displacements ?? null}
            selectedNode={selectedNode}
            onNodesChange={setNodes}
            onElementsChange={setElements}
            onSelectNode={setSelectedNode}
            onSelectElement={setSelectedElement}
          />
          <div className="status">{status}</div>
          <CalculateButton onCalculate={handleCalculate} solving={solving} />
          <DynamicsPanel
            buildProblem={buildProblem}
            onShowShape={setShapeOverlay}
          />
        </section>
        <aside className="side-panel">
          <PropertiesPanel
            nodes={nodes}
            selectedNode={selectedNode}
            selectedElement={selectedElement}
            material={material}
            onNodesChange={setNodes}
            onMaterialChange={setMaterial}
          />
          <DataTable
            nodes={nodes}
            elements={elements}
            nnConfig={nnConfig}
            results={results}
            onNodesChange={setNodes}
            onElementsChange={setElements}
            onNnConfigChange={setNnConfig}
          />
        </aside>
      </main>
    </div>
  );
}
