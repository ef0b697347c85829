"""Test harness configuration.

All tests run on CPU with 8 virtual devices so that every sharding/collective
path is exercised without TPU hardware (SURVEY.md §4e).  These env vars must
be set before jax initializes its backends, hence the top-of-module placement.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize on this machine pins jax_platforms to "axon,cpu" (the TPU
# tunnel); env vars are ignored, so force CPU through the config API before
# any backend initializes.
jax.config.update("jax_platforms", "cpu")

# Enable float64 for the parity oracle tests (the dense-Lambda quirk makes
# float32 elementwise comparison meaningless; see test_op_parity.py).  Tests
# exercising production numerics pass explicit float32 arrays, which are
# unaffected by this flag.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference PyTorch implementation for golden-value parity.

    The reference tree is read-only public content mounted at /root/reference;
    we import its modules (not copy them) purely as a numerical oracle.
    """
    if not reference_available():
        pytest.skip("reference implementation not mounted")
    import sys

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import data.adjacency as ref_adjacency  # noqa
    import network.st_graphconv as ref_graphconv  # noqa

    return {"adjacency": ref_adjacency, "graphconv": ref_graphconv}


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
