"""Test harness config.

Default mode: run everything on CPU with 8 virtual devices.  This
gives the multi-chip sharding tests a real 8-device mesh without TPU
hardware (SURVEY.md §4: a capability the CUDA reference lacked), and
keeps the suite runnable anywhere.  Pallas kernels run with
``interpret=True``.

Hardware mode (``NMCH_TPU_TESTS=1``): the backend is left alone (the
attached TPU stays the default) and only ``@pytest.mark.tpu`` tests
run — the real-Mosaic-lowering regression suite in test_tpu_hw.py.
See that module's docstring for compile-time expectations.

Note: the env var JAX_PLATFORMS alone is NOT enough here — this
machine's axon sitecustomize calls ``jax.config.update("jax_platforms",
"axon,cpu")`` at interpreter start, overriding the env.  A later
config.update (before any backend is touched) wins.
"""

import os

import pytest

HW_MODE = os.environ.get("NMCH_TPU_TESTS") == "1"

if not HW_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if HW_MODE:
        skip = pytest.mark.skip(
            reason="NMCH_TPU_TESTS=1: hardware mode runs only -m tpu "
                   "tests (the CPU suite needs the 8-device virtual "
                   "mesh conftest sets up in default mode)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="hardware-only: set NMCH_TPU_TESTS=1 on a machine "
                   "with a TPU (see tests/test_tpu_hw.py)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
