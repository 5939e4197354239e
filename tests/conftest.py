"""Test harness: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's hermetic test strategy (SURVEY.md section 4:
in-memory SurrealDB instead of a cluster): here, the multi-chip shard/merge
path runs on 8 virtual CPU devices instead of a v5e-8 slice. Must set env
before the first jax import anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
