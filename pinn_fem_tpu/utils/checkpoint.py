"""Checkpoint / resume for incremental solves.

The reference has NO persistence across processes (SURVEY §5: warm starts
live only inside one run; NN weights are exported in results but never
reloaded).  This module is the strict superset the survey calls for:
the (u, theta, increment index) state of an incremental solve is written
after every converged increment and can be restored to continue a killed
or preempted run.

Format: flax msgpack serialization for the array pytree + a JSON sidecar
for metadata — dependency-light, deterministic, and portable across hosts
(orbax is available for sharded multi-host arrays; these states are tiny).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def save_increment_state(
    directory,
    increment: int,
    u: np.ndarray,
    theta: Any,
    meta: Optional[Dict] = None,
) -> Path:
    """Persist the post-increment solver state (atomic rename)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    state = {"u": np.asarray(u), "theta": theta}
    blob = serialization.to_bytes(state)
    tmp = directory / ".state.tmp"
    tmp.write_bytes(blob)
    path = directory / "state.msgpack"
    tmp.replace(path)
    (directory / "meta.json").write_text(json.dumps({
        "increment": increment,
        **(meta or {}),
    }))
    return path


def save_transient_state(directory, step: int, u: np.ndarray,
                         v: np.ndarray, meta: Optional[Dict] = None) -> Path:
    """Persist (step, u, v) of a transient integration (atomic rename)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tmp = directory / ".transient.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, u=np.asarray(u), v=np.asarray(v))
    path = directory / "transient.npz"
    tmp.replace(path)
    (directory / "transient_meta.json").write_text(json.dumps({
        "step": int(step), **(meta or {}),
    }))
    return path


def load_transient_state(directory):
    """Restore (step, u, v, meta) or None if no transient checkpoint."""
    directory = Path(directory)
    state_file = directory / "transient.npz"
    meta_file = directory / "transient_meta.json"
    if not state_file.exists() or not meta_file.exists():
        return None
    meta = json.loads(meta_file.read_text())
    with np.load(state_file) as z:
        u, v = z["u"], z["v"]
    return int(meta["step"]), u, v, meta


def load_increment_state(directory, theta_template: Any):
    """Restore (increment, u, theta) or None if no checkpoint exists.

    theta_template provides the pytree structure/shapes (msgpack stores
    leaves positionally).
    """
    directory = Path(directory)
    state_file = directory / "state.msgpack"
    meta_file = directory / "meta.json"
    if not state_file.exists() or not meta_file.exists():
        return None
    meta = json.loads(meta_file.read_text())
    template = {"u": np.zeros(0), "theta": theta_template}
    state = serialization.from_bytes(template, state_file.read_bytes())
    return int(meta["increment"]), np.asarray(state["u"]), state["theta"]
