"""Test harness: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's hermetic test strategy (SURVEY.md section 4:
in-memory SurrealDB instead of a cluster): here, the multi-chip shard/merge
path runs on 8 virtual CPU devices instead of a v5e-8 slice. Must set env
before the first jax import anywhere.
"""

import os

# Force CPU: the ambient environment points JAX at the (single,
# process-exclusive) tunneled TPU chip — a sitecustomize registers the
# plugin at interpreter start and sets jax_platforms itself, so the env
# var alone is NOT enough; the config must be overridden after import,
# before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
