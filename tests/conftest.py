"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the validation strategy demanded by SURVEY.md §4: CPU-executable
kernel tests (Pallas interpret mode) and multi-chip sharding faked via
xla_force_host_platform_device_count — no TPU required in CI.

Note: this environment pre-imports jax via sitecustomize with a TPU plugin
registered, so JAX_PLATFORMS env vars are already baked; we must switch the
platform through jax.config (which wins over the cached env value).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
