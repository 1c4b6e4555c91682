// Selected-node BC/load editor + global material editor with unit hints.
// Parity with /root/reference/frontend/src/components/PropertiesPanel.jsx.

export default function PropertiesPanel({
  nodes, selectedNode, selectedElement, material,
  onNodesChange, onMaterialChange,
}) {
  const node = selectedNode != null ? nodes[selectedNode] : null;

  const updateNode = (patch) => {
    const next = nodes.slice();
    next[selectedNode] = { ...next[selectedNode], ...patch };
    onNodesChange(next);
  };

  return (
    <div className="properties-panel">
      <h4>Material</h4>
      <div className="row">
        <label>E (Pa)</label>
        <input value={material.young}
          onChange={(e) => onMaterialChange({
            ...material, young: parseFloat(e.target.value) || 0 })} />
        <label>A (m²)</label>
        <input value={material.area}
          onChange={(e) => onMaterialChange({
            ...material, area: parseFloat(e.target.value) || 0 })} />
        <label>ρ (kg/m³)</label>
        <input value={material.density}
          onChange={(e) => onMaterialChange({
            ...material, density: parseFloat(e.target.value) || 0 })} />
      </div>
      <div className="derived">
        EA = {(material.young * material.area).toExponential(3)} N ·
        ρA = {(material.density * material.area).toExponential(3)} kg/m
      </div>

      {node && (
        <>
          <h4>Node {selectedNode}</h4>
          <div className="row">
            <label>x</label>
            <input value={node.x}
              onChange={(e) => updateNode({ x: parseFloat(e.target.value) || 0 })} />
            <label>y</label>
            <input value={node.y}
              onChange={(e) => updateNode({ y: parseFloat(e.target.value) || 0 })} />
          </div>
          <div className="row">
            <label>
              <input type="checkbox" checked={!!node.fixedX}
                onChange={(e) => updateNode({ fixedX: e.target.checked })} />
              fix x
            </label>
            <label>
              <input type="checkbox" checked={!!node.fixedY}
                onChange={(e) => updateNode({ fixedY: e.target.checked })} />
              fix y
            </label>
          </div>
          <div className="row">
            <label>Fx (N)</label>
            <input value={node.fx || 0}
              onChange={(e) => updateNode({ fx: parseFloat(e.target.value) || 0 })} />
            <label>Fy (N)</label>
            <input value={node.fy || 0}
              onChange={(e) => updateNode({ fy: parseFloat(e.target.value) || 0 })} />
          </div>
        </>
      )}

      {selectedElement != null && (
        <div className="row">Element {selectedElement} selected</div>
      )}
    </div>
  );
}
