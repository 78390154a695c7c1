"""Test harness: force an 8-device virtual CPU mesh so sharding logic is
exercised without TPU hardware, mirroring gsplat's CPU-oracle test pattern
(reference: submodules/gsplat/tests/test_basic.py uses pure-torch oracles)."""

import os

# Force CPU even if the ambient env selects a TPU platform (e.g.
# JAX_PLATFORMS=axon): tests are numeric-tolerance-calibrated for fp32 CPU
# and exercise sharding on a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# backend at interpreter start and hard-sets jax_platforms="axon,cpu" via
# jax.config.update — which OVERRIDES the env var above, silently running
# "CPU" tests on (and contending for) the one real TPU chip. Re-update the
# config before any backend initializes; this is a no-op when no axon
# registration happened.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _reference_available() -> bool:
    return os.path.isdir("/root/reference/src")


def torch_reference():
    """Import the reference repo's torch utils as parity oracles (optional)."""
    if not _reference_available():
        pytest.skip("reference repo unavailable")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    return torch
