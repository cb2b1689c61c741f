# coding: utf-8
"""Smoke test for the bench driver's tiny mode.

The driver runs ``python bench.py`` on the real chip at the end of every
round; this guards the entry point itself (imports, measurement plumbing,
JSON contract) on CPU with tiny shapes (``BENCH_TINY=1``). The full-size
numbers are only meaningful on hardware.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_emits_contract_json():
    # ~80 s on the 1-CPU test host: a full tiny-mode bench subprocess.
    # MUST be run (--runslow) after ANY edit to bench.py — it is the only
    # guard on the JSON contract the round driver consumes.
    env = dict(os.environ, BENCH_TINY="1", JAX_PLATFORMS="cpu")
    # bench.py calls jax.config internally only via env; force CPU the
    # same way conftest does for the child process
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys; sys.argv = ['bench.py', '400'];"
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)

    # a timed-out run emits the partial dict (status='incomplete') and
    # exits 0 — surface that as the failure cause, not a value assert
    assert result.get("status") != "incomplete", \
        f"bench timed out; stderr tail: {out.stderr[-2000:]}"
    # the driver's contract: one JSON object with these fields
    assert result["metric"] == "rtf_60s_e2e"
    assert result["unit"] == "ratio"
    assert isinstance(result["value"], (int, float)) and result["value"] > 0
    assert result["vs_baseline"] > 0
    # sub-metrics the README/PERFORMANCE docs cite
    for key in ("encode_ms", "ctc_ms", "prefill_ms", "generate_ms",
                "generate_tokens_per_s", "total_s"):
        assert key in result, key
    # speculative metrics must be present (None allowed only on failure,
    # and tiny mode must not fail)
    assert result["generate_tokens_per_s_spec"] is not None
    assert result["generate_tokens_per_s_spec_ceiling"] is not None
