"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container globally forces JAX_PLATFORMS=axon (remote TPU tunnel) via
sitecustomize, so the env var alone doesn't stick — use jax.config.update
before any backend is touched. Multi-chip sharding paths are validated on
host-platform virtual devices; the real-chip path is exercised by bench.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: compiles dominate the suite's wall time
# (70-layer encoder + decode program variants); caching them across runs
# cuts repeat runs several-fold. Keyed by HLO hash, so staleness is
# impossible by construction; override the location with FUNASR_TEST_CACHE
# (set it empty to disable).
_cache = os.environ.get("FUNASR_TEST_CACHE", "/tmp/funasr_test_xla_cache")
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # the cache refuses single-device processes by default
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked @pytest.mark.slow")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    config.addinivalue_line(
        "markers", "slow: heavyweight case (full-size weights / long runs); "
        "skipped unless --runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
