"""Pallas DIA stencil kernel (production path for TPU banded matvecs):
interpreter-mode parity with the XLA slicing matvec, for both the pack-
per-call and the packed (CG hot-loop) APIs.  Compiled-mode parity and the
performance numbers live in benchmarks/scaling.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental import pallas as pl

from pinn_fem_tpu import Material, TrussProblem
from pinn_fem_tpu.ops.cg import stiffness_coefficients
from pinn_fem_tpu.ops.dia import assemble_dia, dia_layout, dia_matvec


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import pinn_fem_tpu.ops.pallas.dia_kernel as dk

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(dk.pl, "pallas_call", patched)
    return dk


@pytest.mark.parametrize("n_nodes", [777, 3000])
def test_pallas_dia_matches_xla_slicing(interpret_pallas, n_nodes):
    dk = interpret_pallas
    nodes = np.stack([np.arange(n_nodes, dtype=float), np.zeros(n_nodes)], 1)
    elements = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], 1)
    p = TrussProblem(nodes, elements,
                     Material(young=2.0, area=0.5, density=1.0),
                     np.zeros(2 * n_nodes), np.array([0, 1]), 2)
    data = p.to_device()
    layout = dia_layout(np.asarray(data.dof_map), p.ndof)
    s = stiffness_coefficients(data, p.material, 1.0)
    diags = assemble_dia(layout, s, data.gvec)
    u = jnp.asarray(np.random.default_rng(0).normal(size=p.ndof), jnp.float32)

    ref = np.asarray(dia_matvec(layout, diags, u))
    out = np.asarray(dk.dia_matvec_pallas(layout, diags, u))
    np.testing.assert_array_equal(out, ref)

    # Packed (pack-once) API — the CG hot path — and a non-default block.
    packed = dk.pack_dia_interleaved(layout, diags, rows=128)
    out2 = np.asarray(dk.dia_matvec_packed(layout, packed, u))
    np.testing.assert_array_equal(out2, ref)
