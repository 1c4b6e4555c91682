"""Per-iteration progress emission (reference observability parity).

The reference prints a tabular header and one row every
``config.print_every`` iterations during gradient descent
(/root/reference/FEM/python/fem/solver.py:245-249, 325-333).  Our GD loops
run entirely on device inside ``lax.while_loop`` — there is nothing to
print *during* the loop — so the same lines are emitted POST-HOC from the
preallocated history buffer, through the package logger (which the CLI
wires to stdout + the ``<stem>.log`` file, matching the reference's
print-to-stdout behavior under its logging capture).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

logger = logging.getLogger("pinn_fem_tpu.solvers")


def ensure_console_logging() -> None:
    """Attach a bare stdout handler to the package logger if none exists.

    Called by the solvers when ``verbose=True`` so library users see the
    progress output the reference printed to stdout; the CLI installs its
    own file+stdout handlers first, in which case this is a no-op.
    """
    import sys

    pkg = logging.getLogger("pinn_fem_tpu")
    if not pkg.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(message)s"))
        pkg.addHandler(h)
        pkg.setLevel(logging.INFO)


def log_gd_progress(
    history: List[Dict[str, float]],
    print_every: int,
    log: Optional[logging.Logger] = None,
) -> None:
    """Emit the reference's GD progress table from a history list.

    Rows are GD-style history entries (``iteration``, ``loss_total``,
    ``loss_physics``, ``loss_data``, ``u_norm``, ``residual_norm``, and
    ``theta_norm`` when NN materials are present).  NR-style entries
    (single per-increment summaries keyed ``iterations``) are skipped —
    the incremental driver logs those itself.

    Matches the reference's emission rule: iteration 1 always prints, then
    every ``print_every``-th iteration (solver.py:325).
    """
    log = log or logger
    if print_every <= 0:
        print_every = 1
    # Full-NR rows also carry loss_total but use their own column set
    # (grad norms instead of residual/u norms) — print their own table.
    fnr_rows = [e for e in history if "grad_norm_u" in e]
    if fnr_rows:
        log.info("%s", f"{'Iter':>6} | {'Loss Total':>12} | "
                       f"{'Loss Physics':>12} | {'||R||':>12} | "
                       f"{'|grad u|':>10} | {'|grad th|':>10}")
        log.info("%s", "-" * 78)
        for e in fnr_rows:
            it = int(e.get("iteration", 0))
            if not (it <= 1 or it % print_every == 0 or e is fnr_rows[-1]):
                continue
            rnorm = (2.0 * e.get("loss_physics", 0.0)) ** 0.5
            log.info(
                "%s",
                f"{it:6d} | {e.get('loss_total', 0.0):12.3e} | "
                f"{e.get('loss_physics', 0.0):12.3e} | {rnorm:12.3e} | "
                f"{e.get('grad_norm_u', 0.0):10.3e} | "
                f"{e.get('grad_norm_theta', 0.0):10.3e}",
            )
        return

    gd_rows = [e for e in history if "residual_norm" in e]
    if not gd_rows:
        return
    has_nn = "theta_norm" in gd_rows[-1]

    header = (
        f"{'Iter':>6} | {'Loss Total':>12} | {'Loss Physics':>12} | "
        f"{'||R||':>12} | {'Loss Data':>12} | {'||u||':>10}"
    )
    if has_nn:
        header += f" | {'NN Params':>10}"
    log.info("%s", header)
    log.info("%s", "-" * (82 + (12 if has_nn else 0)))
    for e in gd_rows:
        it = int(e.get("iteration", 0))
        if not (it == 1 or it % print_every == 0 or e is gd_rows[-1]):
            continue
        msg = (
            f"{it:6d} | {e.get('loss_total', 0.0):12.3e} | "
            f"{e.get('loss_physics', 0.0):12.3e} | "
            f"{e.get('residual_norm', 0.0):12.3e} | "
            f"{e.get('loss_data', 0.0):12.3e} | {e.get('u_norm', 0.0):10.3e}"
        )
        if has_nn:
            msg += f" | {e.get('theta_norm', 0.0):10.3e}"
        log.info("%s", msg)
