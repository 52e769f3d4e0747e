"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard JAX "fake backend" for multi-chip logic — an
8-device host-platform mesh lets sharding/pjit tests run without TPU
hardware (see SURVEY.md §4).
"""

import os

# Hard-override: the outer environment pins JAX to the real TPU tunnel
# (an 'axon' sitecustomize pre-imports jax and sets jax_platforms
# directly, so the env var alone is not enough). Unit tests must run on
# the host CPU backend with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-dominated on this
# 1-core box; warm reruns drop from ~8 min to well under 3.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
