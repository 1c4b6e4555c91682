// Tabbed data tables: nodes (coords/BCs/loads), elements, measured data +
// NN field configuration, and the results table.
// Parity with /root/reference/frontend/src/components/DataTable.jsx.

import { useState } from 'react';

function NumCell({ value, onChange }) {
  return (
    <input
      value={value}
      size={6}
      onChange={(e) => onChange(parseFloat(e.target.value) || 0)}
    />
  );
}

export default function DataTable({
  nodes, elements, nnConfig, results,
  onNodesChange, onElementsChange, onNnConfigChange,
}) {
  const [tab, setTab] = useState('nodes');

  const updateNode = (i, patch) => {
    const next = nodes.slice();
    next[i] = { ...next[i], ...patch };
    onNodesChange(next);
  };

  const deleteNode = (i) => {
    onNodesChange(nodes.filter((_, k) => k !== i));
    onElementsChange(
      elements
        .filter(([a, b]) => a !== i && b !== i)
        .map(([a, b]) => [a > i ? a - 1 : a, b > i ? b - 1 : b]),
    );
  };

  const updateNn = (prop, patch) => {
    onNnConfigChange({ ...nnConfig, [prop]: { ...nnConfig[prop], ...patch } });
  };

  return (
    <div className="datatable">
      <div className="tabs">
        {['nodes', 'elements', 'data', 'results'].map((t) => (
          <button key={t} className={tab === t ? 'active' : ''}
                  onClick={() => setTab(t)}>{t}</button>
        ))}
      </div>

      {tab === 'nodes' && (
        <table>
          <thead>
            <tr><th>#</th><th>x</th><th>y</th><th>fix x</th><th>fix y</th>
                <th>Fx</th><th>Fy</th><th /></tr>
          </thead>
          <tbody>
            {nodes.map((n, i) => (
              <tr key={i}>
                <td>{i}</td>
                <td><NumCell value={n.x} onChange={(v) => updateNode(i, { x: v })} /></td>
                <td><NumCell value={n.y} onChange={(v) => updateNode(i, { y: v })} /></td>
                <td><input type="checkbox" checked={!!n.fixedX}
                  onChange={(e) => updateNode(i, { fixedX: e.target.checked })} /></td>
                <td><input type="checkbox" checked={!!n.fixedY}
                  onChange={(e) => updateNode(i, { fixedY: e.target.checked })} /></td>
                <td><NumCell value={n.fx || 0} onChange={(v) => updateNode(i, { fx: v })} /></td>
                <td><NumCell value={n.fy || 0} onChange={(v) => updateNode(i, { fy: v })} /></td>
                <td><button onClick={() => deleteNode(i)}>✕</button></td>
              </tr>
            ))}
          </tbody>
        </table>
      )}

      {tab === 'elements' && (
        <table>
          <thead><tr><th>#</th><th>node i</th><th>node j</th><th /></tr></thead>
          <tbody>
            {elements.map((e, i) => (
              <tr key={i}>
                <td>{i}</td><td>{e[0]}</td><td>{e[1]}</td>
                <td>
                  <button onClick={() =>
                    onElementsChange(elements.filter((_, k) => k !== i))}>✕</button>
                </td>
              </tr>
            ))}
          </tbody>
        </table>
      )}

      {tab === 'data' && (
        <>
          <h4>NN material fields</h4>
          <table>
            <thead>
              <tr><th>property</th><th>NN</th><th>layers</th><th>neurons</th></tr>
            </thead>
            <tbody>
              {Object.keys(nnConfig).map((p) => (
                <tr key={p}>
                  <td>{p}</td>
                  <td><input type="checkbox" checked={nnConfig[p].enabled}
                    onChange={(e) => updateNn(p, { enabled: e.target.checked })} /></td>
                  <td><NumCell value={nnConfig[p].hidden_layers}
                    onChange={(v) => updateNn(p, { hidden_layers: v })} /></td>
                  <td><NumCell value={nnConfig[p].neurons_per_layer}
                    onChange={(v) => updateNn(p, { neurons_per_layer: v })} /></td>
                </tr>
              ))}
            </tbody>
          </table>
          <h4>Measured displacements</h4>
          <table>
            <thead><tr><th>node</th><th>measured uₓ</th><th>measured u_y</th></tr></thead>
            <tbody>
              {nodes.map((n, i) => (
                <tr key={i}>
                  <td>{i}</td>
                  <td><NumCell value={n.measuredUx || 0}
                    onChange={(v) => updateNode(i, { measuredUx: v })} /></td>
                  <td><NumCell value={n.measuredUy || 0}
                    onChange={(v) => updateNode(i, { measuredUy: v })} /></td>
                </tr>
              ))}
            </tbody>
          </table>
        </>
      )}

      {tab === 'results' && (
        <>
          <table>
            <thead><tr><th>node</th><th>uₓ</th><th>u_y</th><th>|u|</th></tr></thead>
            <tbody>
              {results && nodes.map((n, i) => {
                const ux = results.displacements[2 * i] || 0;
                const uy = results.displacements[2 * i + 1] || 0;
                return (
                  <tr key={i}>
                    <td>{i}</td>
                    <td>{ux.toExponential(3)}</td>
                    <td>{uy.toExponential(3)}</td>
                    <td>{Math.hypot(ux, uy).toExponential(3)}</td>
                  </tr>
                );
              })}
            </tbody>
          </table>
          {results?.identified_properties && (
            <pre className="identified">
              {JSON.stringify(
                Object.fromEntries(
                  Object.entries(results.identified_properties).map(([k, v]) => [
                    k,
                    v.type === 'scalar'
                      ? v.value
                      : (v.load_factor_variations
                        ? v.load_factor_variations['load_factor_1.0'].at_elements.values
                        : v.at_elements.values),
                  ]),
                ),
                null, 1,
              )}
            </pre>
          )}
        </>
      )}
    </div>
  );
}
