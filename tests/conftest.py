"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container globally forces JAX_PLATFORMS=axon (remote TPU tunnel) via
sitecustomize, so the env var alone doesn't stick — use jax.config.update
before any backend is touched. Multi-chip sharding paths are validated on
host-platform virtual devices; the real-chip path is exercised by bench.py.
"""

import os
import sys

# Raise the main-thread stack ceiling: XLA:CPU's compiler and executable
# (de)serializers walk program graphs recursively on the calling thread,
# and the spec-decode while_loop programs have crashed the suite with
# rc=139/134 at the default 8 MiB soft limit late in a long run (Linux
# grows the main stack on demand up to the soft limit, so raising it at
# startup extends the headroom for the whole process).
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY \
            else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ImportError, ValueError, OSError):
    pass

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
    # a run killed mid-write can leave a truncated entry that SEGFAULTS
    # later runs' cache reads (observed: rc=139 in
    # jax compilation_cache.get_executable_and_time after a timed-out
    # suite) — an "unclean shutdown" sentinel wipes the dir first
    _sentinel = os.path.join(_cache, ".suite_running")
    if os.path.exists(_sentinel):
        import shutil
        shutil.rmtree(_cache, ignore_errors=True)
    os.makedirs(_cache, exist_ok=True)
    open(_sentinel, "w").close()
    import atexit
    atexit.register(lambda: os.path.exists(_sentinel)
                    and os.remove(_sentinel))
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # the cache refuses single-device processes by default
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_TESTS_RUN = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    """Periodically drop compiled executables.

    XLA:CPU segfaults (rc=139/134) compiling/loading large while_loop
    programs late in a long suite run — at whichever heavy compile
    comes ~400 tests in, across three distinct crash sites (raw
    backend_compile_and_load, cache serialize, cache deserialize),
    while any module alone passes. The trigger tracks CUMULATIVE
    compiled-code state, not a specific program (isolating one test
    just moved the crash to the next big compile). Freeing the jit
    caches every N tests keeps the process under the threshold; the
    persistent on-disk cache makes the forced recompiles cheap.
    """
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 60 == 0:
        import gc
        jax.clear_caches()
        gc.collect()


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked @pytest.mark.slow")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    config.addinivalue_line(
        "markers", "slow: heavyweight case (full-size weights / long runs); "
        "skipped unless --runslow or RUN_SLOW=1")
    config.addinivalue_line(
        "markers", "fast: host-side algorithmics + light jit — the "
        "<2 min mid-development tier (`pytest -m fast`); the full "
        "suite stays the merge gate")


# Modules whose tests are host-side algorithmics or tiny-shape jits —
# measured <=15 s per module on the 1-core CPU host. `pytest -m fast`
# runs them all in under ~2 min; compile-heavy suites (engine e2e,
# parallel meshes, spec decode, per-family HF parity) stay out.
_FAST_MODULES = {
    "test_batch", "test_ctc_align", "test_ctc_beam", "test_datatypes",
    "test_formats", "test_frontend", "test_gguf_interop", "test_hotword",
    "test_imatrix", "test_loaders", "test_metadata", "test_native",
    "test_prompt", "test_spm", "test_tools", "test_convert_llm",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in _FAST_MODULES \
                and "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
