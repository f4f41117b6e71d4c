"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on this fake mesh (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before any `import jax` in the test session, hence top of conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The JAX_PLATFORMS env var is ignored in this environment (a TPU plugin
# claims the backend regardless); the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
# x64 support so parity tests can compare against torch float64 oracles
# without float32 ulp knife-edges; float32 tests still pass f32 arrays.
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))
