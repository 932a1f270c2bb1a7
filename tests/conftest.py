"""Test harness config: force CPU with 8 virtual devices BEFORE jax loads,
so multi-device mesh/sharding tests run anywhere (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin with
# JAX_PLATFORMS=axon; override at the config level (must run before any
# backend initialization) so tests genuinely run on the 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile/CPU tests (full backbones, multi-device steps); "
        "deselect with `-m 'not slow'` for a <5 min fast suite on 1 CPU",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
