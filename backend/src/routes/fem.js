// /api/fem routes — contract parity with the reference
// (/root/reference/backend/src/routes/fem.js): each solve route wraps the
// solver output as {success: true, result} or responds 500 with
// {success: false, error, details}.

import express from 'express';
import { solveFEM, solvePINN, solveGeneric, solveBatch } from '../services/pythonRunner.js';

const router = express.Router();

function solveHandler(name, solver) {
  return async (req, res) => {
    try {
      console.log(`Received ${name} solve request`);
      console.log('  Nodes:', req.body.nodes?.length || 0);
      console.log('  Elements:', req.body.elements?.length || 0);
      const result = await solver(req.body);
      console.log(`${name} solve completed`);
      res.json({ success: true, result });
    } catch (error) {
      console.error(`Error in ${name} solve:`, error.message);
      res.status(500).json({
        success: false,
        error: error.message,
        details: error.stderr || error.stdout,
      });
    }
  };
}

router.post('/solve', solveHandler('FEM', solveFEM));
router.post('/solve-pinn', solveHandler('PINN', solvePINN));
router.post('/solve-generic', solveHandler('GENERIC', solveGeneric));
router.post('/solve-batch', solveHandler('BATCH', solveBatch));

// Dynamic-analysis routes (parity with the Python server's
// /api/fem/{modal,transient,buckling,harmonic}): the route name fills in
// analysis.type when absent and delegates to the generic CLI, whose
// "analysis" block contract is documented in pinn_fem_tpu/io/analysis.py.
function solveAnalysis(kind) {
  return (problemData) => {
    const analysis = { type: kind, ...(problemData.analysis || {}) };
    const body = (kind === 'frame' || kind === 'frame3d' || kind === 'shell'
                  || kind === 'plane' || kind === 'solid' || kind === 'plate')
      ? { ...problemData, element_type: kind, analysis }
      : { ...problemData, analysis };
    return solveGeneric(body);
  };
}

for (const kind of ['modal', 'transient', 'buckling', 'harmonic', 'spectrum',
                    'continuation', 'plastic', 'random', 'reduction',
                    'identification', 'sizing', 'reliability', 'frame',
                    'frame3d', 'shell', 'plane', 'solid', 'plate']) {
  router.post(`/${kind}`, solveHandler(kind.toUpperCase(), solveAnalysis(kind)));
}

router.get('/info', (req, res) => {
  res.json({
    version: '1.0.0',
    framework: 'pinn_fem_tpu (JAX/XLA, TPU-native)',
    solvers: {
      fem: {
        name: 'Classic FEM',
        description: 'Incremental Newton-Raphson truss solver',
        element_types: ['truss1d', 'truss2d', 'truss3d'],
        methods: ['incremental_newton_raphson'],
      },
      pinn: {
        name: 'Physics-Informed Neural Networks',
        description: 'Material identification (scalar or NN fields)',
        methods: ['gradient_descent', 'newton_raphson', 'hybrid',
                  'full_newton', 'gauss_newton'],
      },
      dynamics: {
        name: 'Structural dynamics',
        description: 'Transient (central difference / Newmark-beta), '
          + 'modal, buckling, harmonic, spectrum, random vibration, '
          + 'continuation, elastoplastic statics, reduction, '
          + 'identification (time/FRF/modal), '
          + 'sizing optimization and FORM reliability',
        methods: ['central', 'newmark', 'modal', 'buckling', 'harmonic',
                  'spectrum', 'random', 'continuation', 'plastic',
                  'reduction', 'identification', 'sizing', 'reliability',
                  'frame', 'plane', 'solid', 'plate'],
      },
    },
    backend: 'jax',
    dependencies: ['jax', 'flax', 'optax', 'numpy'],
  });
});

export default router;
