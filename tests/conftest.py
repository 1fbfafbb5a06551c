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


_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "plant")


@pytest.fixture(scope="session")
def native_build():
    """Build the native C++ plant (shared lib + plant_node) once per
    session so the C++<->JAX parity and UDP e2e tests RUN instead of
    silently skipping on a fresh checkout (round-2 review finding: the
    parity guarantee was unenforced because binaries are untracked)."""
    import subprocess

    lib = os.path.join(_NATIVE_DIR, "libindy7plant.so")
    exe = os.path.join(_NATIVE_DIR, "plant_node")
    if not (os.path.exists(lib) and os.path.exists(exe)):
        r = subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-j4"],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-400:]}")
    return _NATIVE_DIR
