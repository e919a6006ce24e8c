"""Test harness config: run everything on CPU with 8 virtual devices.

This gives the multi-chip sharding tests a real 8-device mesh without
TPU hardware (SURVEY.md §4: a capability the CUDA reference lacked),
and keeps the suite runnable anywhere.

Note: the env var JAX_PLATFORMS alone is NOT enough here — this
machine's axon sitecustomize calls ``jax.config.update("jax_platforms",
"axon,cpu")`` at interpreter start, overriding the env.  A later
config.update (before any backend is touched) wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
