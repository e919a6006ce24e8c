"""Phase-level timing of the QMC engine (real TPU).

Splits fe_moments_qmc's cost into (a) point generation + bridge matmul
(qmc_increments_mxu) and (b) the path simulation scan (_sim_payoff),
to target the round-3 Pallas work where the time actually goes.

Usage: python benchmarks/qmc_profile.py [--n 524288] [--N 1000]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.device_get([jax.tree.leaves(o)[0] for o in outs])
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--n-shifts", type=int, default=8)
    args = ap.parse_args()

    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops import fe_qmc

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    n = args.n // args.n_shifts
    N = args.N

    # reduce to scalars INSIDE jit: holding reps x (N, M) increment
    # arrays alive OOMs the chip at 2^19 points
    @jax.jit
    def inc_sum(ep):
        dW1, dW2 = fe_qmc.qmc_increments_mxu(N, n, ep, k0, k1,
                                             jnp.float32(1.0),
                                             n_shifts=args.n_shifts)
        return jnp.sum(dW1) + jnp.sum(dW2)

    t_inc = timed(lambda: inc_sum(jnp.uint32(1)))
    print(f"increments (gen+bridge): {t_inc*1e3:.1f} ms", flush=True)

    @jax.jit
    def full_sum(ep):
        dW1, dW2 = fe_qmc.qmc_increments_mxu(N, n, ep, k0, k1,
                                             jnp.float32(1.0),
                                             n_shifts=args.n_shifts)
        return jnp.sum(fe_qmc._sim_payoff(params, N, dW1, dW2))

    t_gen_sim = timed(lambda: full_sum(jnp.uint32(1)))
    print(f"gen + simulation scan:   {t_gen_sim*1e3:.1f} ms "
          f"(scan alone ~ {max(t_gen_sim - t_inc, 0)*1e3:.1f} ms)",
          flush=True)

    full = jax.jit(functools.partial(
        fe_qmc.fe_moments_qmc, params, N=N, n_paths=args.n,
        n_shifts=args.n_shifts))
    t_full = timed(lambda: full(jnp.uint32(1), k0, k1))
    print(f"full fe_moments_qmc:     {t_full*1e3:.1f} ms", flush=True)
    g = args.n * N / t_full / 1e9
    print(f"raw throughput: {g:.2f} G path-steps/s", flush=True)


if __name__ == "__main__":
    main()
