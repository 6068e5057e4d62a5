"""Test config: force JAX onto CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md section 4, test-strategy item 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
