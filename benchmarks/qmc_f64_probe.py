"""Attribute the QMC CI plateau: map quantization vs f32 simulation.

Round-4 follow-up to the hardware attribution runs (RESULTS.md soak):
the ndtri polynomial error was measured irrelevant, and the 23-bit
upper-tail u-quantization is fixed by rng/sobol.py::pm_sign_from_words.
The remaining candidate noise floor is **f32 rounding inside the
Euler simulation itself** (~1e-7 relative per step x 1000 steps).

Method (CPU, float64 available): generate the SAME f32 increment
matrices (new symmetric map), then simulate each replicate's payoff
twice — once in f32 (production path) and once in f64 — and compare
the replicate-spread CIs.  If the f64-sim CI is materially smaller,
the plateau's floor is simulation rounding (fix = double-float state);
if equal, the map fix was the whole story and the remaining CI is
genuine RQMC variance.

Run: JAX_ENABLE_X64=1 not needed — we cast manually.
    python benchmarks/qmc_f64_probe.py [--points 20] [--N 1000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # TPUs have no f64
jax.config.update("jax_enable_x64", True)   # f64 path for the probe

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


def sim_payoff_sums(params, N, dW1, dW2, n_shifts, dtype):
    """Replicate payoff sums simulated at the given dtype from f32
    increments (replicate-major point axis)."""
    jdt = jnp.float64 if dtype is np.float64 else jnp.float32
    T, S_0, v_0, r, k, rho, theta, sigma = (params[i].astype(jdt)
                                            for i in range(8))
    dt = T / dtype(N)
    one = dtype(1.0)
    A = k * theta * dt
    B = one - k * dt
    rho_c = jnp.sqrt(one - rho * rho)
    n = dW1.shape[1]
    S = jnp.full((n,), S_0, dtype)
    v = jnp.full((n,), v_0, dtype)

    def body(carry, gs):
        S, v = carry
        dw1, dw2 = gs[0].astype(dtype), gs[1].astype(dtype)
        sqv = jnp.sqrt(v)
        zc = rho * dw1 + rho_c * dw2
        S = S * (one + r * dt + sqv * zc)
        v = jnp.abs(B * v + A + sqv * (sigma * dw1))
        return (S, v), None

    (S, _), _ = lax.scan(body, (S, v), (dW1, dW2))
    payoff = jnp.maximum(S - S_0, dtype(0.0))
    return jnp.sum(payoff.reshape(n_shifts, n // n_shifts), axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20,
                    help="log2 total points")
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=1 << 14)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from nmch_tpu.ops.fe_qmc import qmc_increments_mxu
    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from scipy.stats import t as _t

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    n_shifts = 8
    n = (1 << args.points) // n_shifts
    chunk = min(args.chunk, n)
    assert n % chunk == 0

    sim32 = jax.jit(sim_payoff_sums, static_argnums=(1, 4, 5))
    tq = float(_t.ppf(0.975, n_shifts - 1))

    for epoch in range(args.epochs):
        sums = {np.float32: np.zeros(n_shifts, np.float64),
                np.float64: np.zeros(n_shifts, np.float64)}
        for c in range(n // chunk):
            dW1, dW2 = qmc_increments_mxu(
                args.N, chunk, jnp.uint32(epoch), k0, k1,
                jnp.float32(1.0), n_shifts=n_shifts,
                base=np.uint32(c * chunk))
            dW1 = dW1.astype(jnp.float32)
            dW2 = dW2.astype(jnp.float32)
            for dt_ in (np.float32, np.float64):
                s = sim32(params, args.N, dW1, dW2, n_shifts, dt_)
                sums[dt_] += np.asarray(s, np.float64)
        out = {}
        for dt_, name in ((np.float32, "f32"), (np.float64, "f64")):
            means = sums[dt_] / n
            ci = tq * means.std(ddof=1) / np.sqrt(n_shifts)
            out[name] = (means.mean(), ci)
        print(f"epoch {epoch}: f32 price {out['f32'][0]:.8f} "
              f"CI {out['f32'][1]:.3e} | f64 price {out['f64'][0]:.8f} "
              f"CI {out['f64'][1]:.3e}", flush=True)


if __name__ == "__main__":
    main()
