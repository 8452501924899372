"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (the driver separately
dry-runs the multi-chip path via ``__graft_entry__.dryrun_multichip``).

Pallas kernels run through the interpreter on CPU (``backend.py``), so the
same kernel code paths are exercised here and compiled on real TPUs.
"""

import os

# Must happen before the first jax import anywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize pre-registers a TPU backend and pins
# JAX_PLATFORMS=axon before user code runs; override it here.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
    yield
