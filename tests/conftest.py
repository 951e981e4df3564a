"""Test environment: force an 8-device virtual CPU platform BEFORE jax import
so sharding tests exercise a real Mesh without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

# The axon TPU plugin's sitecustomize overrides jax_platforms at import time;
# force CPU again post-import so tests are hermetic and the virtual 8-device
# mesh is honored.
import jax

jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Load the golden-value fixtures dumped from the PyTorch reference.

    Regenerate with: python tests/golden/gen_golden.py (needs /root/reference).
    """
    path = GOLDEN_DIR / "reference_golden.npz"
    if not path.exists():
        pytest.skip("golden fixture missing; run tests/golden/gen_golden.py")
    return dict(np.load(path, allow_pickle=False))
