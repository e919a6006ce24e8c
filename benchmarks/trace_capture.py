"""Capture a committed jax.profiler trace of the headline FE kernel.

The analogue of the reference's committed nsys report
(``profilings/FE_B_MMng``): an independently-inspectable device trace
of the production configuration (rot=4, rng=tpu, 2^19 groups x
N=10^4), written under benchmarks/out/trace/ (perfetto-loadable
.json.gz / .pb inside the plugins/profile dir), plus a one-line
summary of the duration on stdout.

Run on the TPU: python benchmarks/trace_capture.py
View: TensorBoard (profile plugin) or ui.perfetto.dev on the .json.gz.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.fe_pallas import fe_moments_pallas
    from nmch_tpu.utils.profiling import trace

    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "out", "trace")
    os.makedirs(logdir, exist_ok=True)

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])

    def run(epoch):
        return fe_moments_pallas(params, sw, jnp.uint32(epoch),
                                 jnp.uint32(0), N=10_000, n_paths=1 << 19,
                                 rng="tpu", rot=4)

    jax.device_get(run(0))          # compile outside the trace
    with trace(logdir):
        t0 = time.perf_counter()
        outs = [run(1 + i) for i in range(3)]
        jax.device_get(outs)
        dt = (time.perf_counter() - t0) / 3
    print(f"traced 3 runs, {dt*1e3:.1f} ms/run -> {logdir}")
    for f in sorted(glob.glob(os.path.join(logdir, "**", "*"),
                              recursive=True)):
        if os.path.isfile(f):
            print(" ", os.path.relpath(f, logdir),
                  f"({os.path.getsize(f)} B)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
