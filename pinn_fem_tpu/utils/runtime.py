"""Runtime configuration for the TPU-native PINN-FEM framework.

Centralizes dtype policy, persistent XLA compilation caching, and platform
selection so every entry point (CLI, bench, tests) behaves identically.

TPU v5e has no native float64, so the framework runs float32 end-to-end and
recovers accuracy in the linear solves via one step of iterative refinement
(see ops/linalg.py).  Setting ``PINN_FEM_TPU_X64=1`` enables float64 for
CPU-only runs (useful when cross-checking against closed forms).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp

_CONFIGURED = False


def configure(cache_dir: str | None = None) -> None:
    """Idempotent global setup: x64 policy + persistent compilation cache.

    The benchmark problems are latency-dominated by XLA compile time, not
    FLOPs, so a persistent compilation cache is load-bearing: after the first
    run every solve is pure device execution.
    """
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True

    if os.environ.get("PINN_FEM_TPU_X64", "0") == "1":
        jax.config.update("jax_enable_x64", True)

    # Honor an explicit JAX_PLATFORMS env var.  Some TPU-attachment plugins
    # (e.g. the axon PJRT shim) force jax_platforms at interpreter startup,
    # silently overriding the environment; re-applying the env value here
    # restores standard JAX semantics (tests rely on JAX_PLATFORMS=cpu).
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            if jax.config.jax_platforms != env_platforms:
                jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    # Persistent compilation cache: load-bearing for TPU (remote compiles
    # take minutes through the attachment tunnel), but skipped for forced-CPU
    # runs — XLA:CPU AOT cache entries bake in host machine features, and
    # reusing them across heterogeneous hosts risks SIGILL.
    if env_platforms and "cpu" in env_platforms.split(","):
        return
    cache = cache_dir or os.environ.get(
        "PINN_FEM_TPU_CACHE",
        str(Path.home() / ".cache" / "pinn_fem_tpu" / "xla_cache"),
    )
    try:
        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never a hard failure
        pass


def default_dtype() -> jnp.dtype:
    """float64 iff x64 was explicitly enabled, else float32 (TPU native)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def tpu_likely() -> bool:
    """is_tpu() WITHOUT initializing a backend.

    `jax.devices()` through the axon attachment costs seconds to
    minutes of tunnel attach (measured: consistently-11 s fresh-process
    `dyn-transient` CLI runs whose ONLY device touch was the
    `is_tpu()` tier predicate; first-fetch stalls reach 444.9 s).
    Tier decisions must not pay that: if backends are already up, ask
    the real one (free); otherwise read the CONFIGURED platform list —
    the axon plugin force-sets `jax_platforms="axon,cpu"` at
    interpreter startup, so its presence is a reliable attached-TPU
    signal, and tests/CLI pins set "cpu" explicitly."""
    try:
        from jax._src import xla_bridge

        if xla_bridge._backends:
            return is_tpu()
    except Exception:
        return is_tpu()
    try:
        plats = jax.config.jax_platforms or ""
    except Exception:
        plats = ""
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower()
    return first in ("tpu", "axon")
