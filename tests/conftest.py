"""Test configuration: force an 8-device CPU backend before JAX initializes.

This is the JAX fake-backend story the reference lacks entirely (it has no
test suite — SURVEY.md §4): multi-chip sharding semantics are exercised on a
virtual 8-device CPU mesh.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel)
# and a sitecustomize module imports jax at interpreter boot, locking the env
# var into jax.config before this file runs — so update jax.config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
