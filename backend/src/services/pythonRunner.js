// Python solver process bridge.
//
// Same temp-file JSON protocol as the reference
// (/root/reference/backend/src/services/pythonRunner.js:65-125): write
// input JSON, spawn the solver CLI with [input, output] argv, enforce a
// timeout, read/parse/cleanup.  Two deliberate fixes over the reference:
//   * unique temp names via crypto.randomUUID() — the reference used
//     Date.now(), which collides for concurrent same-millisecond requests
//     (pythonRunner.js:75-77, SURVEY §7.4);
//   * module CLIs (python -m ...) instead of script paths, so PYTHONPATH
//     is the only coupling to the solver checkout.

import { spawn } from 'child_process';
import { randomUUID } from 'crypto';
import fs from 'fs/promises';
import path from 'path';
import { fileURLToPath } from 'url';

const __dirname = path.dirname(fileURLToPath(import.meta.url));
const REPO_ROOT = path.resolve(__dirname, '..', '..', '..');
const TEMP_DIR = path.join(REPO_ROOT, 'backend', 'temp');
const PYTHON = process.env.PYTHON_BIN || 'python';

const FEM_TIMEOUT_MS = 60_000;
const PINN_TIMEOUT_MS = 300_000;

async function runModule(moduleName, inputData, timeoutMs) {
  await fs.mkdir(TEMP_DIR, { recursive: true });
  const id = randomUUID();
  const inputFile = path.join(TEMP_DIR, `input_${id}.json`);
  const outputFile = path.join(TEMP_DIR, `output_${id}.json`);

  await fs.writeFile(inputFile, JSON.stringify(inputData, null, 2));

  try {
    await new Promise((resolve, reject) => {
      const child = spawn(PYTHON, ['-m', moduleName, inputFile, outputFile], {
        cwd: REPO_ROOT,
        env: { ...process.env, PYTHONPATH: REPO_ROOT },
      });

      let stdout = '';
      let stderr = '';
      child.stdout.on('data', (d) => { stdout += d; process.stdout.write(d); });
      child.stderr.on('data', (d) => { stderr += d; process.stderr.write(d); });

      const timer = setTimeout(() => {
        child.kill('SIGTERM');
        const err = new Error(`Solver timeout after ${timeoutMs / 1000}s`);
        err.stdout = stdout;
        err.stderr = stderr;
        reject(err);
      }, timeoutMs);

      child.on('close', (code) => {
        clearTimeout(timer);
        if (code === 0) {
          resolve();
        } else {
          const err = new Error(`Solver exited with code ${code}`);
          err.stdout = stdout;
          err.stderr = stderr;
          reject(err);
        }
      });
      child.on('error', (e) => { clearTimeout(timer); reject(e); });
    });

    const raw = await fs.readFile(outputFile, 'utf-8');
    return JSON.parse(raw);
  } finally {
    await fs.unlink(inputFile).catch(() => {});
    await fs.unlink(outputFile).catch(() => {});
  }
}

export async function solveFEM(problemData) {
  return runModule('pinn_fem_tpu.cli.api_fem_solver', problemData, FEM_TIMEOUT_MS);
}

export async function solvePINN(problemData) {
  const solverType = problemData.solver_type || 'gradient_descent';
  const moduleName = solverType === 'newton_raphson'
    ? 'pinn_fem_tpu.cli.api_pinn_nr'
    : 'pinn_fem_tpu.cli.api_pinn_gd';
  return runModule(moduleName, problemData, PINN_TIMEOUT_MS);
}

export async function solveGeneric(problemData) {
  // The generic CLI takes [problem.json, output.json] like the api_* ones.
  return runModule('pinn_fem_tpu.cli.generic', problemData, PINN_TIMEOUT_MS);
}

export async function solveBatch(problemData) {
  // Batched dp-parallel solves (extension): B load cases per request.
  return runModule('pinn_fem_tpu.cli.api_batch', problemData, PINN_TIMEOUT_MS);
}
