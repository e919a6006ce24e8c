"""FE kernel variant / tile-geometry microbenchmark (real TPU).

The TPU analogue of the reference's NTPB x NB execution-time grid
(``results/execution_time_comparison.png``): sweeps the fused-kernel
knobs (normal-generation variant ``box``, per-iteration block
``unroll``, ``tile_rows``) at the headline config and prints one CSV
row per point.  The measured optimum feeds ``_pick_tile_rows`` and the
bench.py defaults.

Timing: compile + warm-up discarded; REPS runs queued back-to-back and
materialized in one device_get (amortizes the axon tunnel's ~28 ms
per-dispatch RPC).

Usage:
  python benchmarks/fe_micro.py --boxes hc,turns --unrolls 1,2,4 \
      --tiles 512 [--rng tpu] [--n-paths 524288] [--N 10000] [--csv out]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", default="hc")
    ap.add_argument("--unrolls", default="1")
    ap.add_argument("--tiles", default="512")
    ap.add_argument("--rots", default="1",
                    help="rotation copies per stream; throughput counts "
                         "rot * n_paths * N path-steps")
    ap.add_argument("--rng", default="tpu")
    ap.add_argument("--fast-sqrts", default="0",
                    help="comma list of 0/1: sweep the fast_sqrt flag")
    ap.add_argument("--n-paths", type=int, default=1 << 19)
    ap.add_argument("--N", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.fe_pallas import fe_moments_pallas

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    from nmch_tpu.utils.backend import on_tpu as _is_tpu
    on_tpu = _is_tpu()

    rows_total = args.n_paths // 128
    out_lines = ["box,fsqrt,rot,unroll,tile_rows,ms,gpathsteps,price"]
    print(out_lines[0], flush=True)

    for box in args.boxes.split(","):
     for fsq in (int(x) for x in args.fast_sqrts.split(",")):
      for rot in (int(x) for x in args.rots.split(",")):
        for unroll in (int(u) for u in args.unrolls.split(",")):
            for tile in (int(t) for t in args.tiles.split(",")):
                if rows_total % tile:
                    continue

                def run(epoch):
                    return fe_moments_pallas(
                        params, sw, jnp.uint32(epoch), jnp.uint32(0),
                        N=args.N, n_paths=args.n_paths, tile_rows=tile,
                        rng=args.rng, interpret=not on_tpu,
                        box=box, unroll=unroll, rot=rot,
                        fast_sqrt=bool(fsq))

                try:
                    m, _ = run(0)
                    jax.device_get(m)  # compile + warm-up
                    t0 = time.perf_counter()
                    outs = [run(1 + i) for i in range(args.reps)]
                    vals = jax.device_get(outs)
                    dt = (time.perf_counter() - t0) / args.reps
                except Exception as e:  # record, keep sweeping
                    line = (f"{box},{fsq},{rot},{unroll},{tile},ERROR,"
                            f"{type(e).__name__},")
                    print(line, flush=True)
                    out_lines.append(line)
                    continue
                g = rot * args.n_paths * args.N / dt / 1e9
                line = (f"{box},{fsq},{rot},{unroll},{tile},{dt*1e3:.2f},"
                        f"{g:.2f},{float(vals[-1][0]):.6f}")
                print(line, flush=True)
                out_lines.append(line)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("\n".join(out_lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
