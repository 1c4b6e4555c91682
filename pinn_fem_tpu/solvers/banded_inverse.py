"""Large-mesh Young-modulus identification on the banded adjoint —
the element-family-generic core behind
models/plane.identify_plane_young_banded and
models/solid.identify_solid_young_banded (round-4 VERDICT #5 lifted
past one family).

The forward model is u(E) = K(E)^{-1} f through ops/dia.dia_solve_diff
(lax.custom_linear_solve over the banded PCG), so every ADAM step
costs exactly two banded solves (forward + adjoint) and memory stays
O(band * ndof) — the dense path's traced (ndof, ndof) K is what capped
identification at DENSE_DOF_LIMIT.  The element family enters ONLY
through `blocks_of(young_e) -> (m, w, w)` stiffness blocks (linear in
E per element for every isotropic family here), so plane Q4/CST and
solid hex8 ride the identical loop.

Parameterizations (most- to least-determined):
  zones=[[elem ids..], ..]: one log-E per zone (damage localization —
      exactly identifiable from a handful of probes).
  field=MLPField seed params: a smooth E(x) MLP at element centroids
      (the reference's NN-property form, smoothness-regularized).
  default: per-element log-E.
"""

from __future__ import annotations

import numpy as np


class DiaLayoutView:
    """DiaLayout proxy whose entry_slot is a TRACED device array:
    assemble_dia_blocks reads .entry_slot/.n_diags/.ndof only, and
    passing the (nelm·w²)-entry table as a jit argument keeps it out
    of the compiled program's constants (the 67 MB lesson on
    solve_plane_static_banded)."""

    def __init__(self, layout, entry_slot):
        self._layout = layout
        self.entry_slot = entry_slot

    def __getattr__(self, name):
        return getattr(self._layout, name)


def identify_young_banded(layout, entry_slot_dev, blocks_of,
                          base_young, centroids, f_np, mask_np,
                          measured_dofs, measured_disp,
                          n_iter: int = 300,
                          learning_rate: float = 0.05,
                          tol: float = 1e-7, max_iter: int = 20000,
                          zones=None, field: bool = False,
                          seed: int = 0, hidden_layers: int = 2,
                          neurons_per_layer: int = 16,
                          input_dim: int = 2):
    """Returns (young (m,), loss_history, mlp_field_or_None).

    Each ADAM iteration is ONE jitted program (entry-slot table passed
    traced); gradients reach the per-element/zone/MLP parameters
    through assemble_dia_blocks' scatter-add (transposes to a gather)
    and dia_solve_diff's implicit-function rule."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..ops.dia import assemble_dia_blocks, dia_solve_diff

    m = int(np.asarray(base_young).shape[0])
    dtype = jnp.asarray(1.0).dtype
    meas_idx = jnp.asarray(np.asarray(measured_dofs,
                                      dtype=int).reshape(-1))
    meas = jnp.asarray(np.asarray(measured_disp, dtype=float)
                       .reshape(-1), dtype)
    f = jnp.asarray(f_np, dtype)
    mask = jnp.asarray(mask_np, dtype)
    base_young = np.asarray(base_young, dtype=float)

    if zones is not None and field:
        raise ValueError("zones and field are mutually exclusive "
                         "parameterizations")
    if zones is not None:
        zone_of = np.full(m, -1, dtype=int)
        for z, ids in enumerate(zones):
            ids = np.asarray(ids, dtype=int).reshape(-1)
            if ids.size and (ids.min() < 0 or ids.max() >= m):
                raise ValueError(f"zone {z} has element ids outside "
                                 f"[0, {m})")
            if np.any(zone_of[ids] >= 0):
                raise ValueError(f"zone {z} overlaps an earlier zone")
            zone_of[ids] = z
        zone_of_j = jnp.asarray(zone_of)
        base_j = jnp.asarray(base_young, dtype)
        starts = np.array([max(float(np.mean(base_young[zone_of == z])),
                               1e-12) for z in range(len(zones))])
        params0 = jnp.log(jnp.asarray(starts, dtype))

        def young_of(params):
            zone_e = jnp.exp(params)[jnp.clip(zone_of_j, 0)]
            return jnp.where(zone_of_j >= 0, zone_e, base_j)
    elif field:
        from ..models.fields import make_mlp_field

        cent_j = jnp.asarray(centroids, dtype)
        params0 = make_mlp_field(jax.random.PRNGKey(seed),
                                 hidden_layers=hidden_layers,
                                 neurons_per_layer=neurons_per_layer,
                                 input_dim=input_dim,
                                 scale=float(np.mean(base_young)))

        def young_of(fld):
            return fld.eval_batch(cent_j)
    else:
        params0 = jnp.log(jnp.asarray(base_young, dtype))

        def young_of(params):
            return jnp.exp(params)

    # Loss normalized by the MEASUREMENT scale: in SI units a plate
    # deflection is ~1e-6 m, the raw MSE ~1e-12 and its gradient falls
    # below ADAM's eps (1e-8) — the optimizer silently stalls at the
    # start (measured: 150 iterations moved log-E by 6e-3 on an SI
    # slab).  The relative form is unit-invariant; in the healthy
    # regime ADAM's per-parameter normalization makes the trajectory
    # insensitive to the constant factor.
    meas_scale = float(max(np.mean(np.asarray(measured_disp,
                                              dtype=float) ** 2),
                           1e-300))

    def loss_fn(params, entry_slot):
        view = DiaLayoutView(layout, entry_slot)
        blocks = blocks_of(young_of(params))
        diags = assemble_dia_blocks(view, blocks)
        u = dia_solve_diff(layout, diags, f, mask, tol=tol,
                           max_iter=int(max_iter))
        return jnp.mean((u[meas_idx] - meas) ** 2) / meas_scale

    opt = optax.adam(learning_rate)
    state = opt.init(params0)
    params = params0
    hist = []

    @jax.jit
    def step(params, state, entry_slot):
        loss, g = jax.value_and_grad(loss_fn)(params, entry_slot)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(int(n_iter)):
        params, state, loss = step(params, state, entry_slot_dev)
        hist.append(float(loss))
    young = np.asarray(jax.device_get(young_of(params)), dtype=float)
    return young, np.asarray(hist), (params if field else None)
