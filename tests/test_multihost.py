"""Multi-process (simulated multi-host) mesh test.

Runs examples/multihost.py with 2 CPU processes x 4 virtual devices
(jax.distributed + gloo collectives) and asserts the 8-way-sharded
price equals the single-device golden run — the "sharding is schedule,
not math" invariant, now across process boundaries (SURVEY.md §5
distributed backend; the CUDA reference has no multi-device story).
"""

import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from nmch_tpu.params import HestonParams
from nmch_tpu.ops.fe import fe_moments_scan, path_index_grid
from nmch_tpu.rng.philox import split_seed

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_mesh_matches_single_device():
    n_paths, N = 8192, 50
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "multihost.py"),
         "--cpu", "--processes=2", "--local-devices=4",
         f"--paths-per-chip={n_paths // 8}", f"--N={N}", "--port=9745"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"hosts=2 chips=8 paths=8192: price=([0-9.]+)",
                  out.stdout)
    assert m, out.stdout[-2000:]
    sharded_price = float(m.group(1))

    k0, k1 = split_seed(1234)
    ms, _ = jax.jit(fe_moments_scan, static_argnums=1)(
        HestonParams().as_array(), N, path_index_grid(n_paths),
        jnp.uint32(0), k0, k1)
    assert sharded_price == pytest.approx(float(ms), rel=2e-6)
