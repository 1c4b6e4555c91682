// Solver selection + run button.
// Parity with /root/reference/frontend/src/components/CalculateButton.jsx,
// extended with the new solver methods (full Newton, Gauss-Newton).

import { useState } from 'react';

export default function CalculateButton({ onCalculate, solving }) {
  const [solverType, setSolverType] = useState('fem');
  const [tolerance, setTolerance] = useState('1e-6');
  const [maxIterations, setMaxIterations] = useState('5000');
  const [preconditioning, setPreconditioning] = useState(false);

  return (
    <div className="calculate-bar">
      <select value={solverType} onChange={(e) => setSolverType(e.target.value)}>
        <option value="fem">FEM (Newton-Raphson)</option>
        <option value="pinn-gd">PINN — gradient descent</option>
        <option value="pinn-hybrid">PINN — hybrid GD→NR</option>
        <option value="full-nr">Full Newton (coupled Hessian)</option>
        <option value="gn">Gauss-Newton + LM</option>
      </select>
      <label>
        tol
        <input value={tolerance} size={7}
          onChange={(e) => setTolerance(e.target.value)} />
      </label>
      <label>
        max iter
        <input value={maxIterations} size={7}
          onChange={(e) => setMaxIterations(e.target.value)} />
      </label>
      <label>
        <input type="checkbox" checked={preconditioning}
          onChange={(e) => setPreconditioning(e.target.checked)} />
        precondition
      </label>
      <button
        className="primary"
        disabled={solving}
        onClick={() => onCalculate({
          solverType,
          tolerance: parseFloat(tolerance) || 1e-6,
          maxIterations: parseInt(maxIterations, 10) || 5000,
          preconditioning,
        })}
      >
        {solving ? 'Solving…' : 'Calculate ▶'}
      </button>
    </div>
  );
}
