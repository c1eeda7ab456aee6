"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

The real benchmark runs on TPU (bench.py); tests validate numerics and the
multi-chip sharding paths on a virtual CPU mesh as prescribed for this
environment.
"""
import os

# force CPU regardless of the ambient platform (this environment presets
# JAX_PLATFORMS=axon, the TPU tunnel, via a sitecustomize that re-registers
# the plugin; the env var alone does not stick -> use jax.config too).
# RUN_TPU_TESTS=1 keeps the ambient TPU so @pytest.mark.tpu hardware tests
# (production-geometry parity sweeps) can run on the bench chip.
_USE_TPU = os.environ.get("RUN_TPU_TESTS") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the persistent compile cache's serializer segfaults on some of the
    # fuzz sweep's CPU executables (reproducible: zstandard path inside
    # jax compilation_cache put/get); tests don't need warm-process
    # caching, so keep it off here. The TPU/bench processes still use it.
    os.environ.setdefault("LIZARD_TPU_NO_JAX_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Long single-process runs of the interpret-mode kernel suites
    accumulate XLA CPU executables/buffers until the process eventually
    segfaults (observed in full-suite runs ~35-55 min in, inside an
    interpret _lane_call; every module passes in isolation). Dropping
    JAX's in-memory caches between modules keeps the footprint bounded;
    within-module compile reuse is preserved."""
    yield
    import gc
    try:
        jax.clear_caches()
    except Exception:
        pass
    gc.collect()


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run slow tests (full level sweeps, large inputs)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow; use --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
