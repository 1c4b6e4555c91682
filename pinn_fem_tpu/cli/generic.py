"""Generic JSON CLI — the reference-compatible process entry point.

Contract parity with /root/reference/FEM/python/examples/json/generic.py:

    python -m pinn_fem_tpu.cli.generic problem.json [output.json]

  * output defaults to <stem>.res.json next to the input (generic.py:813-818);
  * a <stem>.log file captures the run (overwrite mode, generic.py:67-99);
  * the result JSON carries {success, converged, iterations, displacements,
    reactions, history, nn_parameters?, identified_properties?}
    (generic.py:476-495);
  * exit code 1 with the traceback logged on failure (generic.py:861-867).
"""

from __future__ import annotations

import json
import logging
import sys
from datetime import datetime
from pathlib import Path

import numpy as np

from ..io.results import result_to_output_dict
from ..io.schema import parse_problem_file
from ..solvers.driver import resolve_method
from ..utils.runtime import configure

logger = logging.getLogger("pinn_fem_tpu.cli")


def setup_logging(problem_file: str) -> Path:
    problem_name = Path(problem_file).stem
    log_file = Path(problem_file).parent / f"{problem_name}.log"
    # Handlers on the package logger (not root) so third-party DEBUG noise
    # stays out of the run log.
    pkg_logger = logging.getLogger("pinn_fem_tpu")
    pkg_logger.setLevel(logging.DEBUG)
    pkg_logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    for h in (
        logging.FileHandler(log_file, mode="w", encoding="utf-8"),
        logging.StreamHandler(sys.stdout),
    ):
        h.setFormatter(fmt)
        pkg_logger.addHandler(h)
    logger.info("=" * 60)
    logger.info("PINN-FEM-TPU Generic Solver Log")
    logger.info("Timestamp: %s", datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    logger.info("Problem file: %s", problem_file)
    logger.info("Log file: %s", log_file)
    logger.info("=" * 60)
    return log_file


def run(problem_file: str, output_file: str | None = None, seed: int = 0) -> dict:
    configure()
    with open(problem_file) as fh:
        raw = json.load(fh)     # cheap peek; parse_problem_file
        #                         re-reads (one extra parse per process)
    from ..io.frame_io import is_frame_document

    if is_frame_document(raw):
        # Frame documents are self-describing (three DOFs per node —
        # the truss schema cannot carry them); the analysis family
        # runs on the host tier (io/frame_io.py) with no backend —
        # EXCEPT identification, whose ADAM loop traces the jnp twin
        # and must pin the local CPU tier before any backend query
        # (the axon attach costs ~10-260 s, BENCHMARKS.md).
        from ..io.frame_io import run_frame_document

        logger.info("Frame document: %d nodes, %d elements",
                    len(raw.get("nodes", ())),
                    len(raw.get("elements", ())))
        frame_analysis = raw.get("analysis") or {}
        if (frame_analysis.get("type") == "identification"
                and not frame_analysis.get("on_device", False)):
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
                logger.info("Frame identification: pinned "
                            "jax_platforms=cpu (local tier)")
            except Exception:
                pass  # backends already up: the ctx still works
        output = run_frame_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("FRAME ANALYSIS SUMMARY (%s):", output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "buckling":
            logger.info("  Critical load factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "transient":
            logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                        output["dt"])
        elif output["analysis"] == "harmonic":
            logger.info("  Frequencies swept: %d",
                        len(output["omegas"]))
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u| "
                        "%.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif output["analysis"] == "plastic":
            if output["mechanism"]:
                logger.info("  Collapse at lambda = %.6g (%d hinges)",
                            output["collapse_factor"],
                            len(output["hinges"]))
            else:
                logger.info("  No mechanism up to lambda = %.6g "
                            "(%d hinges)", output["load_factors"][-1],
                            len(output["hinges"]))
        elif output["analysis"] == "reliability":
            logger.info("  beta_min = %s (pf bounds %s)",
                        output["beta_min"], output["system_pf_bounds"])
        elif output["analysis"] == "sizing":
            logger.info("  Weight %.6g after %d iterations",
                        output["weight"], len(output["history"]))
        elif output["analysis"] == "identification":
            vals = output[output["parameter"]]
            logger.info("  Identified %s in [%.6g, %.6g], final loss "
                        "%.3e", output["parameter"], min(vals),
                        max(vals), output["final_loss"])
        else:
            m = np.max(np.abs(np.asarray(output["end_moments"])))
            logger.info("  Max |end moment|: %.6g (member forces in "
                        "the result)", m)
        logger.info("Results written to %s", output_file)
        return output
    from ..io.frame3d_io import is_frame3d_document

    if is_frame3d_document(raw):
        # 3D space-frame documents (six DOFs per node — torsion and
        # biaxial bending); the whole family runs on the host tier
        # (io/frame3d_io.py), so no backend ever initializes.
        from ..io.frame3d_io import run_frame3d_document

        logger.info("Space-frame document: %d nodes, %d elements",
                    len(raw.get("nodes", ())),
                    len(raw.get("elements", ())))
        output = run_frame3d_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("SPACE-FRAME ANALYSIS SUMMARY (%s):",
                    output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "transient":
            logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                        output["dt"])
        elif output["analysis"] == "harmonic":
            logger.info("  Sweep: %d frequencies, peak |X| %.6g",
                        len(output["omegas"]),
                        max(max(row) for row in output["amplitude"]))
        elif output["analysis"] == "buckling":
            logger.info("  Critical load factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u| "
                        "%.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        else:
            logger.info("  Max |u|: %.6g (dof %d), peak |torque|: "
                        "%.6g", output["max_displacement"],
                        output["max_displacement_dof"],
                        max(abs(v) for v in output["torques"]))
        logger.info("Results written to %s", output_file)
        return output
    from ..io.shell_io import is_shell_document

    if is_shell_document(raw):
        # Flat-facet shell documents (3D midsurfaces, six DOFs per
        # node); host-tier dense solves (io/shell_io.py).
        from ..io.shell_io import run_shell_document

        logger.info("Shell document: %s",
                    "generated midsurface" if "mesh" in raw else
                    f"{len(raw.get('nodes', ()))} nodes, "
                    f"{len(raw.get('elements', ()))} elements")
        output = run_shell_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("SHELL ANALYSIS SUMMARY (%s):", output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "transient":
            logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                        output["dt"])
        elif output["analysis"] == "harmonic":
            logger.info("  Sweep: %d frequencies, peak |X| %.6g",
                        len(output["omegas"]),
                        max(max(row) for row in output["amplitude"]))
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u|"
                        " %.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif output["analysis"] == "buckling":
            logger.info("  Load factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "plastic":
            logger.info("  Steps: %d, yielded facets: %d, "
                        "max von Mises: %.6g", output["n_steps"],
                        len(output["yielded_elements"]),
                        max(output["max_von_mises"]))
        elif output["analysis"] == "nonlinear":
            # max_displacement is always present; "displacements" is
            # size-guarded out of large-mesh payloads (io/shell_io).
            logger.info("  Steps: %d (%s tier), max |u|: %.6g (von "
                        "Kármán/Marguerre)", output["n_steps"],
                        output["tier"], output["max_displacement"])
        elif output["analysis"] == "continuation":
            lf = output["load_factors"]
            logger.info("  Path points: %d (lambda in [%.4g, %.4g])",
                        output["n_points"], min(lf), max(lf))
        elif output["analysis"] == "identification":
            # final_loss is None when n_iter=0 left no history —
            # %s, matching the reliability branch's beta_min.
            logger.info("  Identified %s (%s tier), final loss %s",
                        output["parameter"], output["method"],
                        output["final_loss"])
        elif output["analysis"] == "sizing":
            logger.info("  Weight %.6g after %d iterations",
                        output["weight"], len(output["history"]))
        elif output["analysis"] == "reliability":
            logger.info("  beta_min = %s (pf bounds %s)",
                        output["beta_min"], output["system_pf_bounds"])
        else:
            logger.info("  Max |u|: %.6g (dof %d), peak |N|: %.6g, "
                        "peak |M|: %.6g", output["max_displacement"],
                        output["max_displacement_dof"],
                        max(max(abs(v) for v in row) for row in
                            output["membrane_forces"]),
                        max(max(abs(v) for v in row) for row in
                            output["moments"]))
        logger.info("Results written to %s", output_file)
        return output
    from ..io.plane_io import is_plane_document

    if is_plane_document(raw):
        # Plane (continuum) documents are likewise self-describing
        # (2 DOFs per node but a different material/element contract);
        # the family runs on the host tier (io/plane_io.py).
        from ..io.plane_io import run_plane_document

        logger.info("Plane document: %s",
                    "generated mesh" if "mesh" in raw else
                    f"{len(raw.get('nodes', ()))} nodes, "
                    f"{len(raw.get('elements', ()))} elements")
        plane_analysis = raw.get("analysis") or {}
        if (plane_analysis.get("type") == "identification"
                and not plane_analysis.get("on_device", False)):
            # Same local-tier pin as the truss identification family
            # (below): the ADAM loop and its twin-data solve run on
            # the local CPU backend, and initializing it must not pay
            # the axon tunnel attach.
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
                logger.info("Plane identification: pinned "
                            "jax_platforms=cpu (local tier)")
            except Exception:
                pass  # backends already up: the ctx still works
        output = run_plane_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("PLANE ANALYSIS SUMMARY (%s):", output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "transient":
            if output.get("plastic"):
                logger.info("  Steps: %d (dt=%.3e), yielded elements: "
                            "%d, plastic work: %.6g", output["n_steps"],
                            output["dt"],
                            len(output["yielded_elements"]),
                            output["plastic_work"][-1])
            else:
                logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                            output["dt"])
        elif output["analysis"] == "identification":
            logger.info("  Identified E in [%.6g, %.6g], final loss "
                        "%.3e", min(output["young"]),
                        max(output["young"]), output["final_loss"])
        elif output["analysis"] == "plastic":
            logger.info("  Steps: %d, yielded elements: %d, peak von "
                        "Mises: %.6g", output["n_steps"],
                        len(output["yielded_elements"]),
                        max(output["max_von_mises"]))
        elif output["analysis"] == "harmonic":
            logger.info("  Sweep: %d frequencies, peak |X| %.6g",
                        len(output["omegas"]),
                        max(max(row) for row in output["amplitude"]))
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u| "
                        "%.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif output["analysis"] == "buckling":
            logger.info("  Load factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "reliability":
            logger.info("  beta_min = %s (pf bounds %s)",
                        output["beta_min"], output["system_pf_bounds"])
        elif output["analysis"] == "sizing":
            logger.info("  Weight %.6g after %d iterations",
                        output["weight"], len(output["history"]))
        else:
            logger.info("  Max von Mises: %.6g (element %d)",
                        output["max_von_mises"],
                        output["max_von_mises_element"])
        logger.info("Results written to %s", output_file)
        return output
    from ..io.plate_io import is_plate_document

    if is_plate_document(raw):
        # Mindlin plate documents: self-describing, (w, βx, βy) nodes
        # (io/plate_io.py); the whole family runs on the host tier.
        from ..io.plate_io import run_plate_document

        logger.info("Plate document: %s",
                    "generated mesh" if "mesh" in raw else
                    f"{len(raw.get('nodes', ()))} nodes, "
                    f"{len(raw.get('elements', ()))} elements")
        plate_analysis = raw.get("analysis") or {}
        if (plate_analysis.get("type") == "identification"
                and not plate_analysis.get("on_device", False)):
            # Identification-family local-tier pin (the plane branch
            # above): ADAM loop + twin-data solve on the local CPU
            # backend, no axon tunnel attach.
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
                logger.info("Plate identification: pinned "
                            "jax_platforms=cpu (local tier)")
            except Exception:
                pass  # backends already up: the ctx still works
        output = run_plate_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("PLATE ANALYSIS SUMMARY (%s):", output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "transient":
            logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                        output["dt"])
        elif output["analysis"] == "harmonic":
            logger.info("  Sweep: %d frequencies, peak |X| %.6g",
                        len(output["omegas"]),
                        max(max(row) for row in output["amplitude"]))
        elif output["analysis"] == "buckling":
            logger.info("  Critical membrane-force factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "identification":
            logger.info("  Identified E in [%.6g, %.6g], final loss "
                        "%.3e", min(output["young"]),
                        max(output["young"]), output["final_loss"])
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u| "
                        "%.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif output["analysis"] == "reliability":
            logger.info("  beta_min = %s (pf bounds %s)",
                        output["beta_min"], output["system_pf_bounds"])
        elif output["analysis"] == "sizing":
            logger.info("  Weight %.6g after %d iterations",
                        output["weight"], len(output["history"]))
        elif output["analysis"] == "plastic":
            logger.info("  %d load steps (%d layers), %d elements "
                        "yielded, peak fiber von Mises %.6g",
                        output["n_steps"], output["n_layers"],
                        len(output["yielded_elements"]),
                        max(output["max_von_mises"]))
        else:
            logger.info("  Max deflection: %.6g (node %d), max "
                        "extreme-fiber von Mises: %.6g (element %d)",
                        output["max_deflection"],
                        output["max_deflection_node"],
                        output["max_von_mises"],
                        output["max_von_mises_element"])
        logger.info("Results written to %s", output_file)
        return output
    from ..io.solid_io import is_solid_document

    if is_solid_document(raw):
        # 3D solid (hex8) documents: self-describing, 3 DOFs per node
        # (io/solid_io.py); dense analyses on the host tier, large
        # statics on the banded DIA device tier.
        from ..io.solid_io import run_solid_document

        logger.info("Solid document: %s",
                    "generated mesh" if "mesh" in raw else
                    f"{len(raw.get('nodes', ()))} nodes, "
                    f"{len(raw.get('elements', ()))} elements")
        output = run_solid_document(raw)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("SOLID ANALYSIS SUMMARY (%s):", output["analysis"])
        if output["analysis"] == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % v for v in output["frequencies_hz"]])
        elif output["analysis"] == "transient":
            if output.get("plastic"):
                logger.info("  Steps: %d (dt=%.3e), yielded elements: "
                            "%d, plastic work: %.6g", output["n_steps"],
                            output["dt"],
                            len(output["yielded_elements"]),
                            output["plastic_work"][-1])
            else:
                logger.info("  Steps: %d (dt=%.3e)", output["n_steps"],
                            output["dt"])
        elif output["analysis"] == "plastic":
            logger.info("  Steps: %d, yielded elements: %d, "
                        "max von Mises: %.6g", output["n_steps"],
                        len(output["yielded_elements"]),
                        max(output["max_von_mises"]))
        elif output["analysis"] == "harmonic":
            logger.info("  Sweep: %d frequencies, peak |X| %.6g",
                        len(output["omegas"]),
                        max(max(row) for row in output["amplitude"]))
        elif output["analysis"] == "spectrum":
            logger.info("  Modal mass captured: %.1f%% (%s), peak |u| "
                        "%.6g", 100.0 * output["mass_fraction"],
                        output["combination"],
                        output["max_displacement"])
        elif output["analysis"] == "random":
            logger.info("  PSD grid: %d frequencies, max RMS %.6g",
                        len(output["omegas"]), max(output["rms"]))
        elif output["analysis"] == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif output["analysis"] == "identification":
            # final_loss is None when n_iter=0 left no history —
            # %s, matching the reliability branch's beta_min.
            logger.info("  Identified %s (%s tier), final loss %s",
                        output["parameter"], output["method"],
                        output["final_loss"])
        elif output["analysis"] == "buckling":
            logger.info("  Load factors: %s",
                        ["%.6g" % v for v in output["load_factors"]])
        elif output["analysis"] == "reliability":
            logger.info("  beta_min = %s (pf bounds %s)",
                        output["beta_min"], output["system_pf_bounds"])
        else:
            logger.info("  Max |u|: %.6g, max von Mises: %.6g (%s)",
                        output["max_displacement"],
                        output["max_von_mises"], output["method"])
        logger.info("Results written to %s", output_file)
        return output
    parsed = parse_problem_file(problem_file, seed=seed)
    problem, config = parsed.problem, parsed.config

    logger.info("Nodes: %d", problem.nnode)
    logger.info("Elements: %d", problem.nelm)
    logger.info("Fixed DOFs: %d", len(problem.fixed_dofs))
    logger.info("Has NN: %s", problem.material.has_trainable_params)
    has_meas = parsed.measured_dofs is not None and len(parsed.measured_dofs) > 0
    logger.info("Has measurements: %s", has_meas)
    logger.info(
        "Solver method: %s",
        resolve_method(problem, config, parsed.measured_disp, parsed.measured_dofs),
    )

    analysis = parsed.meta.get("analysis")
    if analysis and parsed.prescribed is not None:
        # schema.py added the prescribed DOFs to fixed_dofs, but their
        # NONZERO values reach only the NR settlement path — running an
        # analysis would silently clamp them at zero.
        raise ValueError("prescribed_displacements cannot be combined "
                         "with an analysis block")
    if analysis:
        # Dynamic-analysis extension: "analysis" block routes to the
        # modal/transient solvers instead of the static driver.
        from ..io.analysis import run_analysis

        if (analysis.get("type") in ("identification", "sizing",
                                     "reliability")
                and not analysis.get("on_device", False)):
            # Identification/sizing below the dense limit runs entirely
            # on the local CPU tier — but jax.devices("cpu") initializes EVERY
            # registered platform first, and under the axon attachment
            # that is a 60-260 s tunnel attach (measured, BENCHMARKS.md
            # dyn-corpus table before this pin) for a run whose whole
            # point is to never touch the device.  This CLI process
            # serves exactly this one document and nothing before this
            # line initializes a backend (parsing is transfer-free), so
            # pin the platform list to cpu outright.
            from ..solvers.newton import DENSE_DOF_LIMIT

            if problem.ndof <= DENSE_DOF_LIMIT:
                import jax

                try:
                    jax.config.update("jax_platforms", "cpu")
                    logger.info("%s document: pinned "
                                "jax_platforms=cpu (local tier)",
                                analysis["type"].capitalize())
                except Exception:
                    pass  # backends already up: the ctx still works

        logger.info("Analysis block: %s", analysis.get("type"))
        output = run_analysis(problem, analysis)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("%s", "=" * 60)
        logger.info("ANALYSIS SUMMARY (%s):", output["analysis"])
        kind = output["analysis"]
        if kind == "modal":
            logger.info("  Frequencies (Hz): %s",
                        ["%.6g" % f for f in output["frequencies_hz"]])
        elif kind == "buckling":
            logger.info("  Critical load factors: %s",
                        output["load_factors"])
        elif kind == "transient":
            logger.info("  Steps: %d (dt=%.3e, method=%s)",
                        output["n_steps"], output["dt"], output["method"])
        elif kind == "harmonic":
            logger.info("  Frequencies swept: %d (%s)",
                        len(output["omegas"]), output["method"])
        elif kind == "spectrum":
            if "per_direction" in output:      # multi-direction response
                logger.info(
                    "  %d directions (%s rule), modal mass %s",
                    len(output["per_direction"]),
                    output["directional_rule"],
                    ", ".join("%.1f%%" % (100.0 * d["mass_fraction"])
                              for d in output["per_direction"]))
            else:
                logger.info("  Modal mass captured: %.1f%% (%s)",
                            100.0 * output["mass_fraction"],
                            output["combination"])
        elif kind == "continuation":
            lf = output["load_factors"]
            logger.info("  Path points: %d (lambda in [%.4g, %.4g])",
                        output["n_points"], min(lf), max(lf))
        elif kind == "reduction":
            logger.info("  %s: %d reduced DOFs, f1 = %.6g Hz",
                        output["method"], output["n_reduced_dofs"],
                        output["reduced_frequencies_hz"][0])
        elif kind == "sizing":
            logger.info(
                "  %s sizing (%s): mass %.6g -> %.6g (%.1f%% lighter), "
                "max stress ratio %s",
                output["objective"], output["method"],
                output["mass_initial"], output["mass"],
                100.0 * output["mass_reduction"],
                ("%.4f" % output["max_stress_ratio"])
                if "max_stress_ratio" in output else "n/a")
            if "min_reliability_beta" in output:
                logger.info(
                    "  RBDO: achieved min beta %.4f over the members "
                    "(target %.4f)",
                    output["min_reliability_beta"],
                    output["target_beta"])
            if "min_fatigue_life_s" in output:
                logger.info(
                    "  Fatigue (%s): min life %.6g h over the members "
                    "(floor %.6g h, critical e%d)",
                    output["fatigue_method"],
                    output["min_fatigue_life_s"] / 3600.0,
                    output["fatigue_min_life_s"] / 3600.0,
                    output["fatigue_critical_element"])
        elif kind == "reliability":
            worst = output["critical_limit_state"]
            logger.info(
                "  FORM over %d limit states: min beta %.4f "
                "(pf %.3e, %s); system pf in [%.3e, %.3e]",
                len(output["labels"]), output["beta_min"],
                output["pf"][worst], output["labels"][worst],
                output["system_pf_bounds"][0],
                output["system_pf_bounds"][1])
            if "mc" in output:
                logger.info(
                    "  Monte-Carlo check: pf %.3e +/- %.1e (%d samples)",
                    output["mc"]["pf"], output["mc"]["std_error"],
                    output["mc"]["n_samples"])
        elif kind == "identification":
            if output.get("mode") == "field":
                vals = output["identified_field"]["at_elements"]["values"]
                logger.info(
                    "  Identified %s(x) field over %d elements in %d "
                    "iters (range %.6g..%.6g, final loss %.3e)",
                    output["field"], len(vals), output["n_iter"],
                    min(vals), max(vals), output["final_loss"])
            else:
                logger.info(
                    "  Identified %s in %d iters (final loss %.3e)",
                    ", ".join(f"{k}={v:.6g}" for k, v
                              in output["identified"].items()),
                    output["n_iter"], output["final_loss"])
        logger.info("Results written to %s", output_file)
        return output

    if parsed.prescribed is not None:
        # Support settlement: inhomogeneous Dirichlet through the NR path.
        from ..solvers.driver import resolve_method as _rm
        from ..solvers.newton import solve_nr

        method = _rm(problem, config, parsed.measured_disp,
                     parsed.measured_dofs)
        if method not in ("nr", "auto"):
            raise ValueError("prescribed_displacements require the "
                             f"Newton-Raphson path (got method={method!r})")
        logger.info("Prescribed displacements on %d DOFs",
                    int(np.count_nonzero(parsed.prescribed)))
        result = solve_nr(problem, config, 1.0,
                          prescribed_u=parsed.prescribed)
        output = result_to_output_dict(result, problem)
        if output_file is None:
            p = Path(problem_file)
            output_file = str(p.parent / f"{p.stem}.res.json")
        with open(output_file, "w") as f:
            json.dump(output, f, indent=2)
        logger.info("Results written to %s", output_file)
        return output

    # Fused-on-TPU / host-stepped-elsewhere selection shared with the HTTP
    # tier (solvers/auto.py); PINN_FEM_TPU_FUSED=0/1 overrides.
    from ..solvers.auto import solve_auto

    result = solve_auto(
        problem,
        config,
        measured_disp=parsed.measured_disp,
        measured_dofs=parsed.measured_dofs,
        verbose=True,
    )

    output = result_to_output_dict(result, problem)

    if output_file is None:
        p = Path(problem_file)
        output_file = str(p.parent / f"{p.stem}.res.json")
    with open(output_file, "w") as f:
        json.dump(output, f, indent=2)

    logger.info("%s", "=" * 60)
    logger.info("SOLUTION SUMMARY:")
    if output.get("success"):
        logger.info("  Status: SUCCESS")
        logger.info("  Iterations: %s", output.get("iterations"))
        disp = output.get("displacements", [])
        if disp:
            logger.info("  Max displacement: %.6e", max(abs(d) for d in disp))
    else:
        logger.info("  Status: FAILED")
    logger.info("Results written to %s", output_file)
    return output


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: python -m pinn_fem_tpu.cli.generic problem.json [output.json]")
        return 1
    problem_file = argv[0]
    output_file = argv[1] if len(argv) > 1 else None
    # NN init seed (an extension: the reference is unseeded torch, so its
    # init-dependent cases — e.g. example6 — cannot be re-rolled).
    import os

    seed = int(os.environ.get("PINN_FEM_TPU_SEED", "0"))
    setup_logging(problem_file)
    try:
        run(problem_file, output_file, seed=seed)
        logger.info("[SUCCESS] Solve completed successfully")
        return 0
    except Exception as e:  # contract: log traceback, exit 1
        import traceback

        logger.error("[ERROR] %s", e)
        logger.error("%s", traceback.format_exc())
        return 1


if __name__ == "__main__":
    sys.exit(main())
