import os

# Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
# without real chips); real-TPU paths are exercised by bench.py / the driver.
#
# NOTE: the environment's sitecustomize imports jax at interpreter startup
# (TPU tunnel plugin), so JAX_PLATFORMS is already latched — we must override
# via jax.config, and set XLA_FLAGS before the first backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# persistent compile cache: test reruns skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jax_executables():
    """Free compiled executables after each module.

    Every XLA:CPU JIT executable pins ~3 small mmaps while jax's caches
    keep it alive; a full-suite run accumulates tens of thousands,
    crosses vm.max_map_count (65530), LLVM's section mmap fails
    ("Cannot allocate memory"), and the failed-compile path leaves a
    stale eh_frame registration that segfaults the next C++ unwind
    (observed: deterministic libgcc crash ~250 tests in). Clearing per
    module keeps the map count bounded; the persistent compile cache
    makes recompiles cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: opt-in scale tests (deselect by default)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if config.getoption("-m"):
        return
    skip = _pytest.mark.skip(reason="slow scale test: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
