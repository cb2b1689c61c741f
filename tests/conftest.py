"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective paths are
validated on host-platform virtual devices, and the real-chip path is
exercised by bench.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
