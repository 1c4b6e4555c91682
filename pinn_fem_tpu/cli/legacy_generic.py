"""Legacy generic CLI variant — entry-point parity with the reference's
older ``examples/generic.py`` (the script its Node backend actually spawns,
pythonRunner.js:46).

Differences from the main CLI (``cli.generic``), matching the legacy
script's observable contract:

  * the run log is TIMESTAMPED: ``<stem>_<YYYYMMDD_HHMMSS>.log`` next to
    the problem file (reference examples/generic.py:68-71), instead of the
    overwritten ``<stem>.log`` its successor standardized on;
  * NN material fields default to ``input_dim=1`` — the legacy script
    hardcodes that (examples/generic.py:209) — unless the problem JSON
    says otherwise.  Note the legacy REFERENCE then crashes on any enabled
    NN in 2D ("mat1 and mat2 shapes cannot be multiplied", verified live:
    its assembly feeds (load_factor, x, y) columns into the 1-input net);
    here narrow nets receive the spatial columns (models/fields.py
    _adapt_inputs), so the legacy web flow actually works.

Everything else (problem schema superset, ``.res.json`` output, exit
codes) is shared with the main CLI.

Usage:
    python -m pinn_fem_tpu.cli.legacy_generic problem.json [output.json]
"""

from __future__ import annotations

import logging
import sys
from datetime import datetime
from pathlib import Path

from .generic import logger, run


def setup_logging_timestamped(problem_file: str) -> Path:
    problem_name = Path(problem_file).stem
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = Path(problem_file).parent / f"{problem_name}_{timestamp}.log"
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
    logger.info("Log file created: %s", log_file)
    return log_file


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: python generic.py problem.json [output.json]")
        return 1
    problem_file = argv[0]
    output_file = argv[1] if len(argv) > 1 else None
    import os

    seed = int(os.environ.get("PINN_FEM_TPU_SEED", "0"))
    log_file = setup_logging_timestamped(problem_file)
    try:
        run(problem_file, output_file, seed=seed)
        logger.info("Log file saved: %s", log_file)
        return 0
    except Exception as e:  # contract: log traceback, exit 1
        import traceback

        logger.error("[ERROR] %s", e)
        logger.error("%s", traceback.format_exc())
        return 1


if __name__ == "__main__":
    sys.exit(main())
