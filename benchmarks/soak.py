"""Scale-out soak: the BASELINE.json config-#5 workload on one chip.

2^26 simulated paths x N=10^4 (as 2^24 rot-4 groups) through the fused
FE kernel in its headline configuration — the long-running pressure
test behind RESULTS.md's "Scale-out soak" numbers (round 3: 3.96 s =
169.4 G path·steps/s on a v5e, price 3e-7 from the oracle).  The
multi-chip mesh divides the same workload linearly across chips
(parallel/mesh.py).

Usage: python benchmarks/soak.py [--groups 2**24] [--N 10000] [--rot 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BASELINE = 99.1e9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=1 << 24)
    ap.add_argument("--N", type=int, default=10_000)
    ap.add_argument("--rot", type=int, default=4)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    from nmch_tpu.params import HestonParams
    from nmch_tpu.results import SimResult
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.fe_pallas import fe_moments_pallas
    from nmch_tpu.oracle import heston_call_undiscounted

    P = HestonParams()
    k0, k1 = split_seed(args.seed)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    from nmch_tpu.utils.backend import on_tpu as _is_tpu
    on_tpu = _is_tpu()

    def run(e):
        return fe_moments_pallas(
            P.as_array(), sw, jnp.uint32(e), jnp.uint32(0), N=args.N,
            n_paths=args.groups, rng="tpu" if on_tpu else "philox",
            rot=args.rot, box="hc16f" if on_tpu else "hc",
            fast_sqrt=on_tpu, interpret=not on_tpu)

    jax.device_get(run(0))                       # compile + warm-up
    t0 = time.perf_counter()
    m, m2 = jax.device_get(run(1))
    dt = time.perf_counter() - t0
    n = args.rot * args.groups
    r = SimResult(float(m), float(m2), n)
    g = n * args.N / dt
    print(f"soak: {dt:.2f} s = {g/1e9:.1f} G path-steps/s "
          f"({g/BASELINE:.2f}x ref GPU); price {r.price:.7f} "
          f"CI {r.ci_error:.2e} oracle "
          f"{heston_call_undiscounted(P):.7f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
