"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is only used by bench.py / __graft_entry__.py; tests always
run on CPU so they are deterministic and can exercise multi-chip sharding
without hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start; override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference source tree not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xB7)
