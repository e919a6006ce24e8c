"""Reduction-only microbenchmark (profilings/timings.txt:23-29 parity).

The reference benchmarks its two reduction strategies in isolation
(classic shared-memory tree 4.53/42.3 ms vs warp-shuffle 2.75/24.3 ms
at 102.4M / 1.024B threads).  The TPU analogue reduces an HBM-resident
f32 array two ways:

* ``pallas``: the production pattern — per-tile VPU tree sum +
  Kahan-compensated sequential-grid scalar accumulation (exactly the
  FE/EM kernels' reduction, ops/fe_pallas.py::_kahan_add);
* ``xla``: plain jnp.sum (XLA's own tree reduction).

Run: python benchmarks/reduction_bench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmch_tpu.ops.fe_pallas import _kahan_add

TILE = 512


def _red_kernel(x_ref, sum_ref, comp_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[0, 0] = 0.0
        comp_ref[0] = 0.0

    _kahan_add(sum_ref, comp_ref, 0, jnp.sum(x_ref[...]))


@functools.partial(jax.jit, static_argnames=("rows",))
def pallas_sum(x, rows: int):
    grid = rows // TILE
    return pl.pallas_call(
        _red_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )(x)[0, 0]


def main() -> int:
    for n_elems in (102_400_000, 1_024_000_000):
        rows = (n_elems // 128 // TILE) * TILE
        n = rows * 128
        x = jnp.ones((rows, 128), jnp.float32) * np.float32(0.5)

        for name, fn in (("pallas+kahan", lambda a: pallas_sum(a, rows)),
                         ("xla jnp.sum", jnp.sum)):
            out = fn(x)
            jax.device_get(out)
            t0 = time.perf_counter()
            outs = [fn(x) for _ in range(5)]
            vals = jax.device_get(outs)
            dt = (time.perf_counter() - t0) / 5
            print(f"{name:13s} {n/1e6:7.1f}M elems: {dt*1e3:7.2f} ms "
                  f"({n*4/dt/1e9:.0f} GB/s)  sum={float(vals[-1]):.1f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
