"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so multi-chip sharding code
paths (mesh search, pjit'd models) are exercised without TPU hardware.
Must run before any jax import.
"""

import os
import sys

# hard override: the image presets JAX_PLATFORMS=axon (the TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env override above can
# be too late — force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def examples_dir():
    d = os.path.join(REFERENCE_DIR, "examples")
    if not os.path.isdir(d):
        pytest.skip("reference examples not available")
    return d


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
