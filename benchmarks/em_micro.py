"""EM kernel variant microbenchmark (real TPU).

Measures the exact-method fused kernel at the reference's headline
config (2^18 paths x N=10^3, ``results/execution_time_comparison.png``
right panel, ~600 ms on the reference GPU) across (rng, conditional)
variants, reporting per-run ms and the CI error (so error-matched
comparisons are possible: time_to_equal_error = ms * (ci/ci_ref)^2).

Usage: python benchmarks/em_micro.py [--n-paths 262144] [--N 1000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-paths", type=int, default=1 << 18)
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default=(
        "philox:0,philox:1,threefry4:0,threefry4:1"))
    ap.add_argument("--poisson-cuts", default="128",
                    help="comma list of poisson_cut values to sweep "
                         "(default 128 = the shipping method default; "
                         "'none' = curand-parity 4000)")
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    from nmch_tpu.params import HestonParams
    from nmch_tpu.results import SimResult
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.em_pallas import em_moments_pallas

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    from nmch_tpu.utils.backend import on_tpu as _is_tpu
    on_tpu = _is_tpu()

    cuts = [None if c in ("", "none") else float(c)
            for c in args.poisson_cuts.split(",")]

    lines = ["rng,conditional,poisson_cut,ms,gpathsteps,price,ci_error"]
    print(lines[0], flush=True)
    for spec in args.variants.split(","):
      for cut in cuts:
        rng, cond = spec.split(":")
        cond = bool(int(cond))

        def run(epoch):
            return em_moments_pallas(
                params, sw, jnp.uint32(epoch), jnp.uint32(0),
                N=args.N, n_paths=args.n_paths, rng=rng,
                conditional=cond, tile_rows=args.tile,
                poisson_cut=cut, interpret=not on_tpu)

        try:
            jax.device_get(run(0))
            t0 = time.perf_counter()
            outs = [run(1 + i) for i in range(args.reps)]
            vals = jax.device_get(outs)
            dt = (time.perf_counter() - t0) / args.reps
        except Exception as e:
            line = f"{rng},{int(cond)},{cut},ERROR,{type(e).__name__},,"
            print(line, flush=True)
            lines.append(line)
            continue
        m, m2 = (float(v) for v in vals[-1])
        res = SimResult(m, m2, args.n_paths)
        g = args.n_paths * args.N / dt / 1e9
        line = (f"{rng},{int(cond)},{cut},{dt*1e3:.1f},{g:.3f},{m:.6f},"
                f"{res.ci_error:.2e}")
        print(line, flush=True)
        lines.append(line)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
