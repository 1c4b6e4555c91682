// Interactive truss canvas: grid, node/element editing, BC/load glyphs,
// deformed-shape overlay with a 1–1000x scale slider.
// Parity with /root/reference/frontend/src/components/FEMCanvas.jsx.

import { useEffect, useRef, useState } from 'react';

const VIEW = { ox: 120, oy: 420, scale: 120 };
const W = 920;
const H = 560;

const toPx = (x, y) => [VIEW.ox + x * VIEW.scale, VIEW.oy - y * VIEW.scale];
const toWorld = (px, py) => [
  (px - VIEW.ox) / VIEW.scale,
  (VIEW.oy - py) / VIEW.scale,
];

export default function FEMCanvas({
  nodes, elements, displacements, selectedNode,
  onNodesChange, onElementsChange, onSelectNode, onSelectElement,
}) {
  const canvasRef = useRef(null);
  const [mode, setMode] = useState('select');
  const [pendingNode, setPendingNode] = useState(null);
  const [defScale, setDefScale] = useState(100);

  useEffect(() => {
    const ctx = canvasRef.current.getContext('2d');
    ctx.clearRect(0, 0, W, H);

    // grid
    ctx.strokeStyle = '#e8e8e8';
    for (let gx = 0; gx < W; gx += VIEW.scale / 2) {
      ctx.beginPath(); ctx.moveTo(gx, 0); ctx.lineTo(gx, H); ctx.stroke();
    }
    for (let gy = 0; gy < H; gy += VIEW.scale / 2) {
      ctx.beginPath(); ctx.moveTo(0, gy); ctx.lineTo(W, gy); ctx.stroke();
    }

    const defPos = (i) => {
      const n = nodes[i];
      if (!displacements) return [n.x, n.y];
      return [
        n.x + defScale * (displacements[2 * i] || 0),
        n.y + defScale * (displacements[2 * i + 1] || 0),
      ];
    };

    // undeformed (dashed when deformed shown)
    for (const [i, j] of elements) {
      const [x1, y1] = toPx(nodes[i].x, nodes[i].y);
      const [x2, y2] = toPx(nodes[j].x, nodes[j].y);
      ctx.setLineDash(displacements ? [6, 5] : []);
      ctx.strokeStyle = displacements ? '#bbb' : '#555';
      ctx.lineWidth = 2;
      ctx.beginPath(); ctx.moveTo(x1, y1); ctx.lineTo(x2, y2); ctx.stroke();
      ctx.setLineDash([]);
    }
    // deformed
    if (displacements) {
      for (const [i, j] of elements) {
        const [ax, ay] = defPos(i);
        const [bx, by] = defPos(j);
        const [x1, y1] = toPx(ax, ay);
        const [x2, y2] = toPx(bx, by);
        ctx.strokeStyle = '#1769d6';
        ctx.lineWidth = 2.5;
        ctx.beginPath(); ctx.moveTo(x1, y1); ctx.lineTo(x2, y2); ctx.stroke();
      }
    }
    // nodes, supports, loads
    nodes.forEach((n, i) => {
      const [px, py] = toPx(n.x, n.y);
      ctx.fillStyle = i === selectedNode ? '#d69417'
        : (i === pendingNode ? '#2aa15f' : '#222');
      ctx.beginPath(); ctx.arc(px, py, 6, 0, 2 * Math.PI); ctx.fill();
      if (n.fixedX || n.fixedY) {
        ctx.strokeStyle = '#c0392b';
        ctx.beginPath();
        ctx.moveTo(px, py + 6);
        ctx.lineTo(px - 8, py + 18);
        ctx.lineTo(px + 8, py + 18);
        ctx.closePath();
        ctx.stroke();
      }
      if (n.fx) {
        const dir = n.fx > 0 ? 1 : -1;
        ctx.strokeStyle = '#2aa15f';
        ctx.lineWidth = 2;
        ctx.beginPath();
        ctx.moveTo(px, py); ctx.lineTo(px + 28 * dir, py);
        ctx.lineTo(px + 20 * dir, py - 5);
        ctx.moveTo(px + 28 * dir, py); ctx.lineTo(px + 20 * dir, py + 5);
        ctx.stroke();
      }
      ctx.fillStyle = '#777';
      ctx.font = '11px system-ui';
      ctx.fillText(String(i), px + 8, py - 8);
    });
  }, [nodes, elements, displacements, selectedNode, pendingNode, defScale]);

  const hitNode = (px, py) => {
    for (let i = 0; i < nodes.length; i++) {
      const [nx, ny] = toPx(nodes[i].x, nodes[i].y);
      if (Math.hypot(nx - px, ny - py) < 14) return i;
    }
    return null;
  };

  const hitElement = (px, py) => {
    for (let e = 0; e < elements.length; e++) {
      const [i, j] = elements[e];
      const [x1, y1] = toPx(nodes[i].x, nodes[i].y);
      const [x2, y2] = toPx(nodes[j].x, nodes[j].y);
      const len2 = (x2 - x1) ** 2 + (y2 - y1) ** 2;
      const t = Math.max(0, Math.min(1,
        ((px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)) / len2));
      const d = Math.hypot(px - (x1 + t * (x2 - x1)), py - (y1 + t * (y2 - y1)));
      if (d < 10) return e;
    }
    return null;
  };

  const handleClick = (ev) => {
    const rect = canvasRef.current.getBoundingClientRect();
    const px = (ev.clientX - rect.left) * W / rect.width;
    const py = (ev.clientY - rect.top) * H / rect.height;

    if (mode === 'node') {
      const [wx, wy] = toWorld(px, py);
      onNodesChange([...nodes, {
        x: Math.round(wx * 4) / 4, y: Math.round(wy * 4) / 4,
        fixedX: false, fixedY: false, fx: 0, fy: 0,
        measuredUx: 0, measuredUy: 0,
      }]);
    } else if (mode === 'element') {
      const hit = hitNode(px, py);
      if (hit !== null) {
        if (pendingNode === null) {
          setPendingNode(hit);
        } else if (hit !== pendingNode) {
          onElementsChange([...elements, [pendingNode, hit]]);
          setPendingNode(null);
        }
      }
    } else {
      const n = hitNode(px, py);
      onSelectNode(n);
      onSelectElement(n === null ? hitElement(px, py) : null);
    }
  };

  return (
    <div>
      <div className="toolbar">
        {['select', 'node', 'element'].map((m) => (
          <button
            key={m}
            className={mode === m ? 'active' : ''}
            onClick={() => { setMode(m); setPendingNode(null); }}
          >
            {m === 'select' ? 'Select' : m === 'node' ? 'Add node' : 'Add element'}
          </button>
        ))}
        <label>
          Deformation ×
          <input
            type="range" min="1" max="1000" value={defScale}
            onChange={(e) => setDefScale(parseInt(e.target.value, 10))}
          />
          {defScale}
        </label>
      </div>
      <canvas ref={canvasRef} width={W} height={H} onClick={handleClick} />
    </div>
  );
}
