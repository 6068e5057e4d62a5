"""Test config: force JAX onto CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md section 4, test-strategy item 4)."""

import os

# Force-set (the driver environment pre-sets JAX_PLATFORMS=axon — the real
# TPU tunnel — which must not leak into unit tests).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A site hook (PYTHONPATH=/root/.axon_site) re-pins jax to the axon TPU at
# import time regardless of the env var; override it post-import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def reference_fixture_dir():
    """The reference repo ships a 5-frame mini-dataset
    (reference: data/training/seq_000).  Use it when present; tests that
    depend on it skip otherwise so the suite is standalone."""
    path = "/root/reference/data/training/seq_000"
    if not os.path.isdir(path):
        pytest.skip("reference fixture dataset not available")
    return path
