"""Test harness config: run everything on CPU with 8 virtual devices.

This gives the multi-chip sharding tests a real 8-device mesh without
TPU hardware (SURVEY.md §4: a capability the CUDA reference lacked),
and keeps the suite runnable anywhere.  Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
