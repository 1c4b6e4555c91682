"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the TPU stand-in for sharding
tests), regardless of any attached accelerator.  This must happen before
jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches between test modules.

    A single pytest process accumulates hundreds of live XLA CPU
    executables across the suite; past ~450 tests the NEXT large
    compile segfaults inside backend_compile (reproduced three times
    at the same file boundary — tests/test_mg.py — and never in
    isolation).  Clearing jax's caches at module boundaries keeps the
    live-executable population bounded; modules recompile their own
    programs anyway, so the only cost is re-tracing the few shared
    cores."""
    yield
    jax.clear_caches()


REFERENCE_JSON_DIR = "/root/reference/FEM/python/examples/json"


@pytest.fixture(scope="session")
def reference_json_dir():
    return REFERENCE_JSON_DIR
