"""Test configuration.

- Forces JAX onto a virtual 8-device CPU mesh (multi-chip sharding tests run
  without TPU hardware; mirrors the driver's dryrun environment).
- Exposes the torch reference implementation at /root/reference as a
  numerical oracle via the ``reference_artist`` fixture (read-only import;
  shims for its optional deps live in tests/_shims).
- Seeds all RNGs for determinism (reference: tests/conftest.py:80-117).
"""

import os
import pathlib
import random
import sys

# Hard override: the container environment pins JAX_PLATFORMS=axon (real TPU
# behind a tunnel with slow remote compiles); tests run on the virtual CPU mesh.
# The axon sitecustomize overrides jax_platforms in-config at import, so the
# env var alone is NOT enough - the config must be forced back after import.
#
# On-TPU lane (mirrors the reference's device-parametrized fixture,
# /root/reference/tests/conftest.py:18-49): ``ARTIST_TEST_TPU=1 pytest -m tpu``
# keeps the real accelerator and runs the ``tpu``-marked kernel/render parity
# tests non-interpreted on the chip. Expect remote-compile latency; run it
# serially (one pytest process).
_TPU_LANE = os.environ.get("ARTIST_TEST_TPU", "") == "1"
if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")
SHIM_DIR = pathlib.Path(__file__).resolve().parent / "_shims"

sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="session")
def deterministic_seeds():
    random.seed(7)
    np.random.seed(7)
    yield


@pytest.fixture(scope="session")
def reference_artist():
    """Import the torch reference (oracle). Skips if unavailable."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference implementation not available")
    for p in (str(SHIM_DIR), str(REFERENCE_ROOT)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch

    torch.manual_seed(7)
    torch.use_deterministic_algorithms(True)
    import artist.io  # noqa: F401  (breaks the reference's io<->scenario import cycle)
    import artist

    return artist


@pytest.fixture(scope="session")
def reference_scenario_dir():
    return REFERENCE_ROOT / "tests" / "data" / "scenarios"


@pytest.fixture(scope="session")
def reference_field_data_dir():
    return REFERENCE_ROOT / "tests" / "data" / "field_data"
