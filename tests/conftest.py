"""Test environment: hermetic CPU backend with a virtual 8-device mesh.

The container's sitecustomize imports jax at interpreter startup (registering
the TPU backend), so env vars alone are too late here — we flip the platform
through jax.config before the backend is instantiated (first device use), which
is what makes the multi-device tests on a CPU-backed fake TPU mesh possible
(SURVEY.md §4: xla_force_host_platform_device_count).
"""

import os

# OPTIONS_TPU_TEST_BACKEND=native runs the suite on the container's real
# backend (enables the TPU-gated statistical kernel tests); default is the
# hermetic virtual mesh.
_NATIVE = os.environ.get("OPTIONS_TPU_TEST_BACKEND") == "native"

if not _NATIVE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _NATIVE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture
def key():
    return jax.random.key(42)
