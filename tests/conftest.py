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
    # Hermeticity: the CLI tests call enable_compilation_cache(), which would
    # otherwise point the WHOLE pytest process at the shared on-disk cache
    # (/tmp/options_tpu_jit_cache) that real-TPU drives also write.
    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:
        pass

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bound_jit_memory_maps():
    """Keep the process under vm.max_map_count (default 65530).

    Every compiled XLA executable holds several anonymous mappings (JIT code
    + guard pages); the full suite compiles thousands of distinct programs
    and crosses the kernel limit near the end, at which point LLVM's JIT
    segfaults on the next big compile (observed: deterministic SIGSEGV in
    backend_compile_and_load at ~50k maps while compiling the surface
    program; isolated runs of the same test pass). Dropping compiled-program
    caches between modules releases the maps (verified: 300 jits 1364 maps
    -> 470 after clear_caches). Threshold-gated so cheap modules keep their
    warm caches."""
    yield
    try:
        with open("/proc/self/maps") as fh:
            n = sum(1 for _ in fh)
    except OSError:  # non-Linux: no limit to manage
        return
    if n > 25_000:
        jax.clear_caches()


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture
def key():
    return jax.random.key(42)
