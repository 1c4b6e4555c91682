"""Fused material-field evaluation kernel (Pallas/TPU).

Evaluates all three MLP material fields (E, A, rho) at every element
midpoint AND the stiffness coefficient s = E * A / L in ONE kernel pass.

Each grid step streams one (8, TILE) block of packed inputs into VMEM,
runs all layers of all three nets on the MXU/VPU without leaving VMEM, and
writes one (8, TILE) block of outputs.

Honest status (TPU v5e, 1M elements): XLA's fused lowering of the same
computation already runs at the bandwidth floor (~0.05 ms) and BEATS this
kernel (~28 ms — the (32, 8) x (8, 512) matmuls underutilize the MXU and
the per-row output writes serialize).  The kernel is kept as validated
infrastructure for locality-blocked fused element kernels (where element
compute must stay in VMEM next to a resident accumulation buffer), not as
the production path — fused_coefficients_supported callers should prefer
ops.assembly.material_values unless profiling says otherwise.

Data layout (lane dimension = elements, the TPU-native orientation):
  input  rows: [load_factor, x, y, 1/L, 0, 0, 0, 0]
  output rows: [E, A, rho, s = E*A/L, 0, 0, 0, 0]
Weights are zero-padded to (PAD_W=32)-row blocks; padded input columns are
zeroed in W1 so the 1/L row never leaks into the nets.

Constraints (else callers fall back to the XLA path, see
fused_coefficients_supported): every field is an MLPField with input_dim=3,
the same number of hidden layers (1 or 2), width <= 32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.fields import Material, MLPField

PAD_IN = 8     # packed input rows
PAD_W = 32     # padded hidden width (real widths <= 32)
TILE = 512     # elements per grid step (lane dim, multiple of 128)


def fused_coefficients_supported(material: Material) -> bool:
    fields = (material.young, material.area, material.density)
    if not all(isinstance(f, MLPField) for f in fields):
        return False
    depths = {len(f.layers) for f in fields}
    if len(depths) != 1 or depths.pop() not in (2, 3):
        return False
    for f in fields:
        if f.input_dim != 3 or not f.enforce_positive:
            return False
        for w, _ in f.layers:
            if w.shape[0] > PAD_W or w.shape[1] > PAD_W:
                return False
    return True


def _pack_field(field: MLPField, dtype):
    """Zero-pad one field's layers to the kernel's fixed shapes.

    Returns (w1t (PAD_W, PAD_IN), b1 (PAD_W, 1), w2t (PAD_W, PAD_W),
    b2 (PAD_W, 1), w3t (PAD_IN, PAD_W), b3+scale packed later).
    Layers are stored as x @ W with W (in, out); the kernel computes
    W^T @ x_cols, so transposes are baked here.
    """
    n_lin = len(field.layers)
    w1, b1 = field.layers[0]
    w1t = jnp.zeros((PAD_W, PAD_IN), dtype).at[: w1.shape[1], : w1.shape[0]].set(w1.T)
    b1p = jnp.zeros((PAD_W, 1), dtype).at[: b1.shape[0], 0].set(b1)

    if n_lin == 3:
        w2, b2 = field.layers[1]
        w2t = jnp.zeros((PAD_W, PAD_W), dtype).at[: w2.shape[1], : w2.shape[0]].set(w2.T)
        b2p = jnp.zeros((PAD_W, 1), dtype).at[: b2.shape[0], 0].set(b2)
    else:  # single hidden layer: identity second stage (tanh skipped in kernel)
        w2t = jnp.eye(PAD_W, dtype=dtype)
        b2p = jnp.zeros((PAD_W, 1), dtype)

    w3, b3 = field.layers[-1]
    w3t = jnp.zeros((PAD_IN, PAD_W), dtype).at[0, : w3.shape[0]].set(w3[:, 0])
    return w1t, b1p, w2t, b2p, w3t, jnp.asarray(b3[0], dtype)


def _material_kernel(x_ref, w_ref, b_ref, meta_ref, out_ref, *, two_hidden):
    """One grid step: (8, TILE) inputs -> (8, TILE) outputs.

    w_ref: (3, PAD_W, PAD_IN + PAD_W + PAD_IN_pad...) packed per field —
    see _pack_all for the exact layout.  meta_ref: (8, 128) with
    [b3_f, scale_f] per field in rows.
    """
    x = x_ref[:]                                   # (8, T)
    for f in range(3):
        w1t = w_ref[f, :, 0:PAD_IN]                # (32, 8)
        w2t = w_ref[f, :, PAD_IN:PAD_IN + PAD_W]   # (32, 32)
        w3row = w_ref[f, :, PAD_IN + PAD_W]        # (32,)
        b1 = b_ref[f, :, 0:1]                      # (32, 1)
        b2 = b_ref[f, :, 1:2]                      # (32, 1)
        b3 = meta_ref[f, 0]
        scale = meta_ref[f, 1]

        h = jnp.tanh(
            jax.lax.dot_general(
                w1t, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1
        )                                          # (32, T)
        z = jax.lax.dot_general(
            w2t, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
        h2 = jnp.tanh(z) if two_hidden else h
        o = jax.lax.dot_general(
            w3row[None, :], h2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0] + b3                                  # (T,)
        val = jax.nn.softplus(o) * scale
        out_ref[f, :] = val

    inv_len = x_ref[3, :]
    out_ref[3, :] = out_ref[0, :] * out_ref[1, :] * inv_len
    # Zero the unused rows so downstream reductions are safe.
    for r in range(4, PAD_IN):
        out_ref[r, :] = jnp.zeros_like(inv_len)


def _pack_all(material: Material, dtype):
    ws, bs, metas = [], [], []
    for f in (material.young, material.area, material.density):
        w1t, b1, w2t, b2, w3t, b3 = _pack_field(f, dtype)
        # Per-field weight sheet: (PAD_W, PAD_IN + PAD_W + 1→pad 128 lanes)
        sheet = jnp.concatenate(
            [w1t, w2t, w3t[0:1, :].T], axis=1
        )  # (32, 8 + 32 + 1) = (32, 41)
        sheet = jnp.pad(sheet, ((0, 0), (0, 128 - sheet.shape[1])))
        ws.append(sheet)
        bsheet = jnp.concatenate([b1, b2], axis=1)  # (32, 2)
        bsheet = jnp.pad(bsheet, ((0, 0), (0, 128 - 2)))
        bs.append(bsheet)
        metas.append(jnp.stack([b3, f.scale.astype(dtype)]))
    w = jnp.stack(ws)                 # (3, 32, 128)
    b = jnp.stack(bs)                 # (3, 32, 128)
    meta = jnp.zeros((8, 128), dtype).at[:3, :2].set(jnp.stack(metas))
    return w, b, meta


def pack_inputs(mid: jnp.ndarray, inv_len: jnp.ndarray, load_factor,
                dtype=jnp.float32) -> Tuple[jnp.ndarray, int]:
    """(nelm, dim) midpoints -> (8, n_padded) packed input block."""
    nelm = mid.shape[0]
    n_pad = ((nelm + TILE - 1) // TILE) * TILE
    x = jnp.zeros((PAD_IN, n_pad), dtype)
    x = x.at[0, :nelm].set(jnp.broadcast_to(jnp.asarray(load_factor, dtype), (nelm,)))
    x = x.at[1, :nelm].set(mid[:, 0].astype(dtype))
    if mid.shape[1] > 1:
        x = x.at[2, :nelm].set(mid[:, 1].astype(dtype))
    x = x.at[3, :nelm].set(inv_len.astype(dtype))
    return x, n_pad


@functools.partial(jax.jit, static_argnames=("two_hidden", "interpret"))
def _run_kernel(x_packed, w, b, meta, two_hidden: bool, interpret: bool):
    n_pad = x_packed.shape[1]
    grid = (n_pad // TILE,)
    out = pl.pallas_call(
        functools.partial(_material_kernel, two_hidden=two_hidden),
        out_shape=jax.ShapeDtypeStruct((PAD_IN, n_pad), x_packed.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PAD_IN, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PAD_W, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PAD_W, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_IN, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAD_IN, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_packed, w, b, meta)
    return out


def fused_material_coefficients(
    data, material: Material, load_factor=1.0, interpret: bool = False
):
    """All-in-one (E, A, rho, s) at element midpoints via the Pallas kernel.

    Returns (young, area, density, s) each of shape (nelm,).
    Requires fused_coefficients_supported(material).
    """
    dtype = data.inv_len.dtype
    two_hidden = len(material.young.layers) == 3
    x_packed, _ = pack_inputs(data.mid, data.inv_len, load_factor, dtype)
    w, b, meta = _pack_all(material, dtype)
    out = _run_kernel(x_packed, w, b, meta, two_hidden, interpret)
    nelm = data.nelm
    return out[0, :nelm], out[1, :nelm], out[2, :nelm], out[3, :nelm]
