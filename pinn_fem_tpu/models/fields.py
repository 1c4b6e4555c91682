"""Material property fields as JAX pytrees.

Capability parity with the reference's property polymorphism
(/root/reference/FEM/python/fem/properties.py: ScalarProperty,
NNProperty.value, to_property) redesigned functionally: a field is a pytree
whose ``eval_batch`` maps a batch of input rows -> a batch of property
values, so the whole assembly evaluates every element's material in one
fused matmul chain on the VPU instead of a Python loop of tiny forwards.

Behavioral contracts preserved from the reference:
  * dict-style inputs are column-stacked in ALPHABETICAL key order, i.e.
    (load_factor, x[, y]) (properties.py:119-125) — load-bearing, because a
    trained network's weights are only meaningful w.r.t. that column order.
  * positive-constrained outputs use softplus(raw) * scale
    (properties.py:152-156).
  * MLP: Linear/Tanh stacks; the LAST layer is initialized to
    weight=0.1, bias=1.0 so softplus(~1)*scale ~= scale at start
    (examples/json/generic.py:137-139).  Hidden layers use torch's default
    Linear init distribution: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both
    weight and bias.
"""

from __future__ import annotations

from typing import Any, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.runtime import default_dtype


@struct.dataclass
class ScalarField:
    """Constant material property (reference: ScalarProperty)."""

    value: jnp.ndarray  # 0-d array so it stays a traceable leaf

    def eval_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, k) inputs -> (n,) constant values."""
        return jnp.broadcast_to(self.value, (x.shape[0],))

    def eval_scalar(self) -> float:
        return float(self.value)

    @property
    def is_trainable(self) -> bool:
        return False

    def trainable_params(self) -> list:
        return []


@struct.dataclass
class MLPField:
    """MLP-parameterized material property (reference: NNProperty + SimpleNN).

    ``layers`` is a list of (W, b) with W shaped (fan_in, fan_out) — inputs
    are row vectors so the forward pass is x @ W + b (the transpose of
    torch's convention; export code transposes back for output parity).
    """

    layers: List[Tuple[jnp.ndarray, jnp.ndarray]]
    scale: jnp.ndarray  # 0-d
    input_dim: int = struct.field(pytree_node=False, default=1)
    enforce_positive: bool = struct.field(pytree_node=False, default=True)

    def raw_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for w, b in self.layers[:-1]:
            h = jnp.tanh(h @ w + b)
        w, b = self.layers[-1]
        return h @ w + b

    def _adapt_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        """Match the assembly's (load_factor, x[, y]) columns to input_dim.

        Fixed reference defect: the reference's assembly always hands its
        NNs a (load_factor, x[, y]) dict regardless of the net's input_dim,
        so any input_dim=1 NN — which is what its LEGACY CLI and therefore
        its own web backend construct (examples/generic.py:209) — crashes
        with "mat1 and mat2 shapes cannot be multiplied (1x3 and 1x20)"
        (verified live).  Here narrower nets receive the SPATIAL columns
        first (x[, y], then load_factor), so input_dim=1 means the E(x)
        field the legacy UI intended; input_dim == dim+1 keeps the
        reference's alphabetical (load_factor, x, y) order for trained-
        weight parity; wider nets are zero-padded (properties.py:139-142).
        """
        width = x.shape[1]
        if self.input_dim == width:
            return x
        if self.input_dim < width:
            spatial = x[:, 1:]                       # (x[, y])
            cols = jnp.concatenate([spatial, x[:, :1]], axis=1)  # + lf last
            return cols[:, : self.input_dim]
        pad = jnp.zeros((x.shape[0], self.input_dim - width), x.dtype)
        return jnp.concatenate([x, pad], axis=1)

    def eval_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, k) assembly inputs -> (n,) positive property values."""
        out = self.raw_forward(self._adapt_inputs(x))
        if self.enforce_positive:
            out = jax.nn.softplus(out)
        return (out * self.scale)[:, 0]

    @property
    def is_trainable(self) -> bool:
        return True

    def trainable_params(self) -> list:
        """Flat list in the reference's parameter order: W, b per layer."""
        out = []
        for w, b in self.layers:
            out.extend([w, b])
        return out

    def n_params(self) -> int:
        return sum(int(np.prod(w.shape)) + int(np.prod(b.shape)) for w, b in self.layers)


Field = Union[ScalarField, MLPField]


def make_mlp_field(
    key: jax.Array,
    hidden_layers: int = 2,
    neurons_per_layer: int = 20,
    input_dim: int = 1,
    scale: float = 1.0,
    enforce_positive: bool = True,
    dtype=None,
) -> MLPField:
    """Build an MLP field with the reference's architecture and init.

    Architecture (generic.py:121-134): Linear(input_dim, n) + Tanh, then
    (hidden_layers - 1) x [Linear(n, n) + Tanh], then Linear(n, 1).
    """
    dtype = dtype or default_dtype()
    sizes = [input_dim] + [neurons_per_layer] * hidden_layers + [1]
    layers = []
    n_lin = len(sizes) - 1
    for i in range(n_lin):
        fan_in, fan_out = sizes[i], sizes[i + 1]
        if i == n_lin - 1:
            # Deterministic last layer: softplus(~1)*scale ~= scale at start.
            w = jnp.full((fan_in, fan_out), 0.1, dtype=dtype)
            b = jnp.full((fan_out,), 1.0, dtype=dtype)
        else:
            key, kw, kb = jax.random.split(key, 3)
            bound = 1.0 / np.sqrt(fan_in)
            w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
            b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        layers.append((w, b))
    return MLPField(
        layers=layers,
        scale=jnp.asarray(scale, dtype=dtype),
        input_dim=input_dim,
        enforce_positive=enforce_positive,
    )


def to_field(value: Any, dtype=None) -> Field:
    """Coerce float/int/Field -> Field (reference: to_property).

    Plain numbers become NUMPY 0-d leaves, not device arrays: parsing a
    problem must not touch the accelerator (the host serving tier,
    ops/host.py, reads the value back without a device round trip —
    through a degraded attachment even one scalar fetch costs seconds).
    The leaf converts on first traced use with identical avals, so jit
    caches are unaffected; traced constructions
    (ScalarField(value=jnp.exp(...)), solvers/transient_inverse.py)
    still carry jnp values."""
    if isinstance(value, (ScalarField, MLPField)):
        return value
    if isinstance(value, (int, float)):
        return ScalarField(value=np.asarray(float(value),
                                            dtype=dtype or default_dtype()))
    raise TypeError(f"Cannot convert {type(value)} to a material field")


@struct.dataclass
class Material:
    """Bundle of the three truss material fields (reference: Material).

    Raw numbers are auto-coerced to ScalarField, matching the reference's
    to_property coercion in Material.__post_init__ (model.py:22-26).
    """

    young: Field
    area: Field
    density: Field

    def __post_init__(self):
        for name in ("young", "area", "density"):
            v = getattr(self, name)
            if isinstance(v, (int, float)):
                object.__setattr__(self, name, to_field(v))

    @property
    def has_trainable_params(self) -> bool:
        return self.young.is_trainable or self.area.is_trainable or self.density.is_trainable

    def trainable_params(self) -> list:
        """All trainable leaves, young -> area -> density (reference order)."""
        return (
            self.young.trainable_params()
            + self.area.trainable_params()
            + self.density.trainable_params()
        )


def assembly_inputs(
    mid_coords: jnp.ndarray, dimension: int, load_factor: jnp.ndarray
) -> jnp.ndarray:
    """Input rows for material evaluation at element midpoints.

    Mirrors the reference's dict construction during assembly
    (nn_assembly.py:143-153, 200-205) combined with NNProperty's
    alphabetical ordering: columns are (load_factor, x) in 1D,
    (load_factor, x, y) in 2D, (load_factor, x, y, z) in 3D (z sorts
    after y, so the alphabetical contract extends unchanged).

    Args:
        mid_coords: (nelm, dimension) element midpoint coordinates.
        dimension: 1, 2 or 3.
        load_factor: traced scalar.

    Returns:
        (nelm, dimension + 1) input matrix.
    """
    n = mid_coords.shape[0]
    lf_col = jnp.broadcast_to(jnp.asarray(load_factor, mid_coords.dtype), (n, 1))
    return jnp.concatenate([lf_col, mid_coords[:, :dimension]], axis=1)


def point_inputs_dict_order(
    coords: np.ndarray, dimension: int, load_factor: float, dtype=None
) -> jnp.ndarray:
    """Same column order as assembly_inputs, for host-side evaluation of
    identified properties at nodes/centroids (generic.py:551-559)."""
    dtype = dtype or default_dtype()
    coords = np.atleast_2d(np.asarray(coords, dtype=float))
    n = coords.shape[0]
    cols = [np.full((n, 1), load_factor)]
    cols.append(coords[:, :1])
    for c in range(1, dimension):
        col = (coords[:, c:c + 1] if coords.shape[1] > c
               else np.zeros((n, 1)))
        cols.append(col)
    return jnp.asarray(np.concatenate(cols, axis=1), dtype=dtype)


def point_inputs_direct(
    coords: np.ndarray, input_dim: int, dtype=None
) -> jnp.ndarray:
    """Direct (non-dict) input path: coordinates zero-padded to input_dim
    (reference properties.py:126-145)."""
    dtype = dtype or default_dtype()
    coords = np.atleast_2d(np.asarray(coords, dtype=float))
    if coords.shape[1] < input_dim:
        pad = np.zeros((coords.shape[0], input_dim - coords.shape[1]))
        coords = np.concatenate([coords, pad], axis=1)
    return jnp.asarray(coords[:, :input_dim], dtype=dtype)
