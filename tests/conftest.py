"""Test config: force an 8-virtual-device CPU platform before JAX loads.

Tests never touch the real TPU — multi-chip sharding is validated on the
virtual CPU mesh (the reference's "launch 4 EC2 instances" integration tier
becomes fake-mesh configs — SURVEY.md §4 implication).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
