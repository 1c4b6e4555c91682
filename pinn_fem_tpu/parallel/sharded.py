"""Explicit-collective SPMD training step: dp x tp over a device mesh.

This is the multi-chip assembly/training design for problem sizes a single
core can't hold (nothing in the reference corpus needs it — SURVEY §2 —
but a production framework does):

  * "dp" shards a batch of independent inverse problems (per-problem u,
    theta, loads, measurements);
  * "tp" shards the ELEMENT arrays of the mesh: each device scatter-adds
    the internal-force contribution of its element shard, and one
    lax.psum over "tp" assembles the global force — the FEM analogue of
    tensor-parallel partial-sum matmuls.  Gradients of replicated
    quantities (u, theta) are psum'd back over "tp", exactly the
    transpose of the forward broadcast.

Written with jax.shard_map so the collectives are explicit and auditable;
the batched.py path shows the same dp story with compiler-inserted
sharding instead.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fields import Material, assembly_inputs
from ..models.problem import TrussProblem
from ..solvers.gd import get_theta, set_theta
from ..solvers.phases import ADAM


def _pad_to_multiple(arr: np.ndarray, mult: int, axis: int = 0, fill=0):
    n = arr.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, constant_values=fill), n


class ShardedTrussSystem:
    """Element-sharded view of a truss problem over a ("dp", "tp") mesh."""

    def __init__(self, problem: TrussProblem, mesh: Mesh):
        self.problem = problem
        self.mesh = mesh
        self.tp = mesh.shape["tp"]
        self.dp = mesh.shape["dp"]

        data = problem.to_device()
        dtype = data.loads.dtype
        self.dtype = dtype
        self.ndof = problem.ndof
        self.dimension = problem.dimension

        # Pad element arrays to a multiple of tp; padded elements carry
        # zero stiffness (inv_len 0) so they are physically inert.
        dof_map, self.nelm = _pad_to_multiple(np.asarray(data.dof_map), self.tp)
        gvec, _ = _pad_to_multiple(np.asarray(data.gvec), self.tp)
        inv_len, _ = _pad_to_multiple(np.asarray(data.inv_len), self.tp)
        mid, _ = _pad_to_multiple(np.asarray(data.mid), self.tp)

        tp_shard = NamedSharding(mesh, P("tp"))
        rep = NamedSharding(mesh, P())
        self.dof_map = jax.device_put(jnp.asarray(dof_map, jnp.int32), tp_shard)
        self.gvec = jax.device_put(jnp.asarray(gvec, dtype), tp_shard)
        self.inv_len = jax.device_put(jnp.asarray(inv_len, dtype), tp_shard)
        self.mid = jax.device_put(jnp.asarray(mid, dtype), tp_shard)
        self.free_mask = jax.device_put(data.free_mask, rep)

    def train_step_fn(self, material: Material, has_meas: bool):
        """Build the jitted dp x tp PINN-GD training step.

        Step signature:
            (u_b, theta_b, opt_u, opt_th, loads_b, mvals_b, mdofs,
             lf, lr_u, lr_th, a_p, a_d) -> (loss_b, u_b, theta_b, opt_u, opt_th)
        with batch arrays sharded P("dp") and element arrays P("tp").
        """
        mesh = self.mesh
        ndof = self.ndof
        dim = self.dimension
        free_mask = self.free_mask

        elem_spec = P("tp")
        batch_spec = P("dp")

        def local_f_int(mat, u, lf, dof_map, gvec, inv_len, mid):
            """Internal force from THIS device's element shard."""
            x = assembly_inputs(mid, dim, lf)
            young = mat.young.eval_batch(x)
            area = mat.area.eval_batch(x)
            s = young * area * inv_len
            gu = jnp.sum(gvec * u[dof_map], axis=-1)
            fe = (s * gu)[:, None] * gvec
            return jnp.zeros(ndof, u.dtype).at[dof_map].add(fe)

        def step(u_b, theta_b, opt_u, opt_th, loads_b, mvals_b, mdofs,
                 lf, lr_u, lr_th, a_p, a_d,
                 dof_map, gvec, inv_len, mid):

            def per_problem_loss(u, theta, loads, mvals):
                mat = set_theta(material, theta)
                f_loc = local_f_int(mat, u, lf, dof_map, gvec, inv_len, mid)
                f_int = jax.lax.psum(f_loc, "tp")  # assemble across shards
                r = (f_int - lf * loads) * free_mask
                loss = a_p * 0.5 * jnp.sum(r * r)
                if has_meas:
                    rd = mvals - u[mdofs]
                    loss = loss + a_d * jnp.mean(rd * rd)
                return loss

            def batch_loss(u_b, theta_b):
                return jnp.sum(
                    jax.vmap(per_problem_loss)(u_b, theta_b, loads_b, mvals_b)
                )

            loss, (gu, gth) = jax.value_and_grad(batch_loss, argnums=(0, 1))(
                u_b, theta_b
            )
            # u and theta are replicated over "tp": sum the per-shard
            # gradient contributions (transpose of the forward broadcast).
            gu = jax.lax.psum(gu, "tp")
            gth = jax.lax.psum(gth, "tp")

            du, opt_u = ADAM.update(gu, opt_u)
            u_b = (u_b - lr_u * du) * free_mask[None, :]
            dth, opt_th = ADAM.update(gth, opt_th)
            theta_b = jax.tree_util.tree_map(
                lambda p, d: p - lr_th * d, theta_b, dth
            )
            loss_b = jax.vmap(per_problem_loss)(u_b, theta_b, loads_b, mvals_b)
            return loss_b, u_b, theta_b, opt_u, opt_th

        def wrapped(u_b, theta_b, opt_u, opt_th, loads_b, mvals_b, mdofs,
                    lf, lr_u, lr_th, a_p, a_d):
            # Per-leaf specs: batch arrays shard over "dp"; scalar leaves
            # (e.g. Adam's count) stay replicated.
            bspec = lambda t: jax.tree_util.tree_map(
                lambda x: batch_spec if jnp.ndim(x) > 0 else P(), t
            )
            sm = jax.shard_map(
                step,
                mesh=mesh,
                in_specs=(
                    batch_spec, bspec(theta_b), bspec(opt_u), bspec(opt_th),
                    batch_spec, batch_spec, P(),
                    P(), P(), P(), P(), P(),
                    elem_spec, elem_spec, elem_spec, elem_spec,
                ),
                out_specs=(
                    batch_spec, batch_spec, bspec(theta_b), bspec(opt_u),
                    bspec(opt_th),
                ),
                check_vma=False,
            )
            return sm(u_b, theta_b, opt_u, opt_th, loads_b, mvals_b, mdofs,
                      lf, lr_u, lr_th, a_p, a_d,
                      self.dof_map, self.gvec, self.inv_len, self.mid)

        return jax.jit(wrapped)

    def init_state(self, batch: int, thetas=None):
        """dp-sharded initial (u, theta, optimizer) state for a batch."""
        from .batched import stack_thetas

        dtype = self.dtype
        theta0 = get_theta(self.problem.material)
        theta_b = stack_thetas(thetas if thetas is not None else [theta0] * batch)
        u_b = jnp.zeros((batch, self.ndof), dtype)
        opt_u = ADAM.init(u_b)
        opt_th = ADAM.init(theta_b)

        dp = NamedSharding(self.mesh, P("dp"))
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dp) if hasattr(x, "ndim") and x.ndim > 0
            else x, t,
        )
        return put(u_b), put(theta_b), put(opt_u), put(opt_th)
