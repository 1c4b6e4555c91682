"""Batched-solve JSON API (extension beyond the reference).

    python -m pinn_fem_tpu.cli.api_batch input.json output.json

Input/output contract: parallel/batched.solve_batch_request — a template
problem (generic schema) plus a (B, ndof) loads_batch, solved in one
vmap'd dp-parallel dispatch.  Spawned by the Node backend's /solve-batch
route; the in-process Python server serves the same function directly.
Error contract matches the other api_* scripts: {error, type} + exit 1.
"""

from __future__ import annotations

import sys

from ..utils.runtime import configure
from ._api_common import api_main


def parse_and_solve(input_data):
    configure()
    from ..parallel.batched import solve_batch_request

    return solve_batch_request(input_data)


def main(argv=None) -> int:
    return api_main(
        parse_and_solve, argv,
        usage="Usage: python -m pinn_fem_tpu.cli.api_batch input.json output.json",
    )


if __name__ == "__main__":
    sys.exit(main())
