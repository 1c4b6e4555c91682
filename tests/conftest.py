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


REFERENCE_JSON_DIR = "/root/reference/FEM/python/examples/json"


@pytest.fixture(scope="session")
def reference_json_dir():
    return REFERENCE_JSON_DIR
