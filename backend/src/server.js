// PINN-FEM-TPU Node backend — Express API gateway.
//
// Route/contract parity with the reference backend
// (/root/reference/backend/src/server.js): CORS + JSON body parsing,
// request logging, /api/fem routes, /api/health, error + 404 handlers,
// port 5000.  The spawned solver is the JAX CLI (pinn_fem_tpu.cli.*)
// instead of the torch scripts; the JSON protocols are identical.
//
// A dependency-free Python implementation of the same API lives at
// pinn_fem_tpu/serve/server.py (runnable without npm).

import express from 'express';
import cors from 'cors';
import bodyParser from 'body-parser';
import femRoutes from './routes/fem.js';

const app = express();
const PORT = process.env.PORT || 5000;

app.use(cors());
app.use(bodyParser.json({ limit: '10mb' }));
app.use(bodyParser.urlencoded({ extended: true }));

app.use((req, res, next) => {
  console.log(`${new Date().toISOString()} - ${req.method} ${req.path}`);
  next();
});

app.use('/api/fem', femRoutes);

app.get('/api/health', (req, res) => {
  res.json({
    status: 'ok',
    message: 'PINN-FEM-TPU backend is running',
    timestamp: new Date().toISOString(),
  });
});

app.use((err, req, res, next) => {
  console.error('Error:', err);
  res.status(500).json({ error: 'Internal server error', message: err.message });
});

app.use((req, res) => {
  res.status(404).json({ error: 'Route not found' });
});

app.listen(PORT, () => {
  console.log(`PINN-FEM-TPU backend running on http://localhost:${PORT}`);
  console.log('API endpoints:');
  console.log('  POST /api/fem/solve          - classic FEM');
  console.log('  POST /api/fem/solve-pinn     - PINN parameter identification');
  console.log('  POST /api/fem/solve-generic  - unified solver');
  console.log('  GET  /api/fem/info           - solver metadata');
  console.log('  GET  /api/health             - health check');
});

export default app;
