// Dynamics panel: modal / buckling analyses over the same problem JSON
// (the "analysis" block contract, pinn_fem_tpu/io/analysis.py), POSTed to
// /api/fem/modal and /api/fem/buckling.  Mirrors the zero-dependency UI's
// dynamics section (serve/static/app.js); mode shapes are displayed by
// handing the selected shape to FEMCanvas as the displacement overlay.

import { useState } from 'react';

export default function DynamicsPanel({ buildProblem, onShowShape }) {
  const [rows, setRows] = useState([]);
  const [kind, setKind] = useState(null);
  const [shapes, setShapes] = useState(null);
  const [message, setMessage] = useState('');

  const run = async (which) => {
    setMessage(`Running ${which} analysis…`);
    try {
      const problem = buildProblem({
        solverType: 'fem', tolerance: 1e-6, maxIterations: 1000,
        preconditioning: false,
      });
      problem.analysis = { n_modes: 4, include_shapes: true };
      const resp = await fetch(`/api/fem/${which}`, {
        method: 'POST',
        headers: { 'Content-Type': 'application/json' },
        body: JSON.stringify(problem),
      });
      const data = await resp.json();
      if (!data.success) throw new Error(data.error || `${which} failed`);
      const r = data.result;
      setKind(which);
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
      setRows([]);
      setShapes(null);
      setMessage(`Error: ${e.message}`);
    }
  };

  return (
    <div className="dynamics-panel">
      <h3>Dynamics</h3>
      <div className="row">
        <button onClick={() => run('modal')}>Modal ▶</button>
        <button onClick={() => run('buckling')}>Buckling ▶</button>
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
      <div className="status">{message}</div>
    </div>
  );
}
