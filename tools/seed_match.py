#!/usr/bin/env python3
"""Seed-matched property-identification parity vs the live torch reference.

BASELINE.json's accuracy criterion is "identified properties within 1e-5 of
the PyTorch baseline".  The reference never seeds torch, so its own runs
scatter at ~1e-3 — a raw comparison can never demonstrate 1e-5.  This tool
closes the gap by eliminating the only nondeterminism: it instantiates the
reference's model for a corpus problem (seeded torch), COPIES the torch NN
init into our MLPField (transposing Linear weights to our (fan_in, fan_out)
layout), runs both frameworks on identical inputs, and diffs the identified
properties field-by-field.

Usage:
    python tools/seed_match.py [example3.json] [--max-iterations N]

Prints a JSON summary {iterations_ref, iterations_ours, max_property_diff,
max_displacement_diff, pass_1e5}.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_GENERIC = "/root/reference/FEM/python/examples/json/generic.py"


def load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_generic", REF_GENERIC)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)  # self-inserts FEM/python into sys.path
    return mod


def torch_nn_to_layers(simple_nn):
    """SimpleNN -> [(W, b), ...] in our (fan_in, fan_out) convention."""
    import torch

    layers = []
    for m in simple_nn.net:
        if isinstance(m, torch.nn.Linear):
            w = m.weight.detach().numpy().T.copy()  # (out,in) -> (in,out)
            b = m.bias.detach().numpy().copy()
            layers.append((w, b))
    return layers


def graft_torch_weights(problem, ref_model):
    """Replace every MLPField's layers with the reference torch init."""
    import jax.numpy as jnp

    from pinn_fem_tpu.models.fields import Material, MLPField

    fields = {}
    for name in ("young", "area", "density"):
        ours = getattr(problem.material, name)
        theirs = getattr(ref_model.material, name)
        if isinstance(ours, MLPField):
            np_layers = torch_nn_to_layers(theirs.net)
            layers = [
                (jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
                for w, b in np_layers
            ]
            for (w0, _), (w1, _) in zip(ours.layers, layers):
                assert w0.shape == w1.shape, (name, w0.shape, w1.shape)
            ours = ours.replace(layers=layers)
        fields[name] = ours
    problem.material = Material(**fields)


def flatten_numbers(obj, prefix=""):
    """Flatten a nested dict/list of floats to {path: value}."""
    out = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(flatten_numbers(v, f"{prefix}.{k}"))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            out.update(flatten_numbers(v, f"{prefix}[{i}]"))
    elif isinstance(obj, (int, float)):
        out[prefix] = float(obj)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("problem", nargs="?",
                    default=os.path.join(REPO, "examples/json/example3.json"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    torch.manual_seed(args.seed)
    ref = load_reference_module()
    ref_parsed = ref.parse_problem(args.problem)

    # Our side: same JSON, then graft the torch init over the MLP fields.
    from pinn_fem_tpu.io.results import result_to_output_dict
    from pinn_fem_tpu.io.schema import parse_problem_file
    from pinn_fem_tpu.solvers.driver import solve

    parsed = parse_problem_file(args.problem)
    graft_torch_weights(parsed.problem, ref_parsed["model"])

    ours_result = solve(
        parsed.problem, parsed.config,
        parsed.measured_disp, parsed.measured_dofs, verbose=False,
    )
    ours = result_to_output_dict(ours_result, parsed.problem)

    theirs = ref.solve_problem(ref_parsed)

    ud = float(np.max(np.abs(
        np.asarray(ours["displacements"]) - np.asarray(theirs["displacements"])
    )))

    ours_props = flatten_numbers(ours.get("identified_properties", {}))
    ref_props = flatten_numbers(theirs.get("identified_properties", {}))
    # Compare value entries only (coords are inputs, identical by
    # construction; comparing them too is harmless but noisy to report).
    keys = sorted(k for k in ref_props if ".values" in k)
    missing = [k for k in keys if k not in ours_props]
    diffs = {k: abs(ours_props[k] - ref_props[k]) for k in keys if k in ours_props}
    max_pd = max(diffs.values()) if diffs else float("nan")
    worst = max(diffs, key=diffs.get) if diffs else None

    print(json.dumps({
        "problem": os.path.basename(args.problem),
        "iterations_ref": theirs["iterations"],
        "iterations_ours": ours["iterations"],
        "converged_ref": theirs["converged"],
        "converged_ours": ours["converged"],
        "max_displacement_diff": ud,
        "n_property_values": len(diffs),
        "max_property_diff": max_pd,
        "worst_property": worst,
        "missing_keys": missing,
        "pass_1e5": bool(diffs) and max_pd < 1e-5,
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
