"""Test config: run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU pods (SURVEY §4 implication)."""

import os

# FORCE the CPU platform (not setdefault): the harness environment exports
# JAX_PLATFORMS=axon, and with it the experimental TPU plugin initializes its
# network tunnel during backend discovery — tests then hang for minutes
# whenever the tunnel is down. The suite is hermetic CPU by design.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax
import numpy as np
import pytest

# The env var alone is NOT enough: the plugin's sitecustomize registration
# runs at interpreter start and force-updates jax_platforms to "axon,cpu".
# Re-pin the CONFIG (runtime-settable, read by backends() at first init) so
# only the CPU backend ever initializes.
jax.config.update("jax_platforms", "cpu")

# Numerical tests compare against float64/numpy ground truth; force full-precision
# matmuls (the backend may otherwise use fast low-precision passes). Production
# code keeps the default so the TPU MXU can use bf16 passes.
jax.config.update("jax_default_matmul_precision", "highest")

# Some environments register an experimental TPU plugin that ignores
# JAX_PLATFORMS; pin the default device to the (8-way virtual) CPU explicitly so
# tests are hermetic and multi-device sharding paths are exercised.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8
    return devs


@pytest.fixture(scope="session")
def sphere_mesh():
    from tests.meshgen import icosphere
    return icosphere(subdivisions=3)  # 642 verts


@pytest.fixture(scope="session")
def grid_mesh():
    from tests.meshgen import flat_grid
    return flat_grid(n=16)  # 256 verts, 450 faces


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
