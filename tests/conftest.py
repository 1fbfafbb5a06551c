"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip (axon tunnel) is reserved for bench.py; unit tests use
the host CPU with 8 virtual devices so sharding tests exercise real
multi-device paths (XLA_FLAGS --xla_force_host_platform_device_count).
"""
import os

# INDY7_TEST_TPU=1 keeps the session on the real chip (for the TPU-only
# kernel tests, e.g. tests/test_pallas_kernel.py); default is the CPU mesh.
_USE_TPU = os.environ.get("INDY7_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon harness routes compiles through a remote tunnel; for
    # CPU-only tests that turns multi-second compiles into multi-minute
    # ones.
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from indy7_mpc_tpu.utils.cache import enable_cache  # noqa: E402

enable_cache()  # persistent compile cache: repeat suite runs skip compiles

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def model64():
    from indy7_mpc_tpu.models import indy7

    return indy7(dtype=jnp.float64)


@pytest.fixture(scope="session")
def model32():
    from indy7_mpc_tpu.models import indy7

    return indy7(dtype=jnp.float32)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
