"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code paths
are validated on XLA's host platform with 8 virtual devices (SURVEY.md §4).
Must run before the first `import jax` anywhere in the test session.
"""

import os

if os.environ.get("MMC_TPU_SMOKE"):
    # TPU smoke mode: leave the platform selection alone so the axon
    # sitecustomize's JAX_PLATFORMS reaches the real chip. Run ONLY the
    # gated smoke in this mode:  MMC_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
