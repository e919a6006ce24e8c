"""Fused Broadie–Kaya "Exact Method" Pallas TPU kernel.

TPU-native re-design of the reference's EM kernel ladder
(``src/NMCH/methods/NMCH_EM.cu:63-369``): per-lane paths tiled as
(rows, 128) float32 blocks, the N-step exact variance transition loop
fused into one kernel with v_t / vI resident on-chip, and the
block-reduce + atomicAdd replaced by in-tile sums accumulated across
the sequential grid (deterministic).

The simulation body is *shared verbatim* with the golden engine
(ops/em.py:em_terminal_core), including the masked-round rejection
samplers (ops/sampling.py) — the reference's warp-divergence hotspot
(``NMCH_EM.cu:327``) becomes masked VPU rounds whose draw counts are
lane-local, so kernel and golden engine are bitwise comparable.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .em import em_terminal_core, em_path_law, em_conditional_payoff
from .fe_pallas import _pick_tile_rows, _kahan_add

LANES = 128


def _em_kernel(pv_ref, sc_ref, sum_ref, sumsq_ref, comp_ref, *, N: int,
               rows: int, rng: str = "philox", conditional: bool = False,
               poisson_cut: float | None = None):
    """One grid program simulates a (rows, 128) tile of EM paths.

    pv_ref: SMEM f32[8]  — (T, S_0, v_0, r, k, rho, theta, sigma)
    sc_ref: SMEM u32[4]  — (k0, k1, epoch, base_path)
    """
    i = pl.program_id(0)
    k0 = sc_ref[0]
    k1 = sc_ref[1]
    epoch = sc_ref[2]
    base = sc_ref[3] + i.astype(jnp.uint32) * np.uint32(rows * LANES)

    rr = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 0)
    cc = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
    path_lo = rr * np.uint32(LANES) + cc + base
    path_hi = jnp.zeros_like(path_lo)

    pv = jnp.stack([pv_ref[j] for j in range(8)])
    if conditional:
        m, sig_eff, _, _, _ = em_path_law(pv, N, path_lo, path_hi, epoch,
                                          k0, k1, rng=rng,
                                          poisson_cut=poisson_cut)
        payoff = em_conditional_payoff(m, sig_eff, pv_ref[1])
    else:
        S_T, _, _, _ = em_terminal_core(pv, N, path_lo, path_hi, epoch,
                                        k0, k1, rng=rng,
                                        poisson_cut=poisson_cut)
        payoff = jnp.maximum(S_T - pv_ref[1], 0.0)   # ATM strike K = S_0
    tile_sum = jnp.sum(payoff)
    tile_sumsq = jnp.sum(payoff * payoff)

    @pl.when(i == 0)
    def _():
        sum_ref[0, 0] = 0.0
        sumsq_ref[0, 0] = 0.0
        comp_ref[0] = 0.0
        comp_ref[1] = 0.0

    _kahan_add(sum_ref, comp_ref, 0, tile_sum)
    _kahan_add(sumsq_ref, comp_ref, 1, tile_sumsq)




@functools.partial(jax.jit, static_argnames=("N", "n_paths", "tile_rows",
                                             "interpret", "rng",
                                             "conditional", "poisson_cut"))
def em_moments_pallas(params_vec, seed_words, epoch, base_path, *,
                      N: int, n_paths: int, tile_rows: int | None = None,
                      interpret: bool = False, rng: str = "philox",
                      conditional: bool = False,
                      poisson_cut: float | None = None):
    """(E[X], E[X^2]) over n_paths exact-scheme paths.

    rng: "philox" (default, curand-family parity) or "threefry4" (the
    fast reproducible generator, rng/threefry4.py) — both engines draw
    identically (lane-local counters, ops/sampling.py).
    poisson_cut: see ops/em.py::em_path_law (EM speed/accuracy knob)."""
    if n_paths % LANES:
        raise ValueError(f"n_paths={n_paths} must be a multiple of {LANES}")
    total_rows = n_paths // LANES
    # EM keeps more live state per lane than FE (sampler carries);
    # measured tile ladder at the headline config (benchmarks/RESULTS.md):
    # 187/164/173/209 ms at 32/64/128/256 rows -> 64 is the optimum
    rows = tile_rows or _pick_tile_rows(total_rows, target=64)
    if total_rows % rows:
        raise ValueError(f"tile_rows={rows} must divide {total_rows}")
    grid = total_rows // rows

    pv = params_vec.astype(jnp.float32)
    sc = jnp.stack([
        seed_words[0].astype(jnp.uint32),
        seed_words[1].astype(jnp.uint32),
        jnp.asarray(epoch, jnp.uint32),
        jnp.asarray(base_path, jnp.uint32),
    ])

    kern = functools.partial(_em_kernel, N=N, rows=rows, rng=rng,
                             conditional=conditional,
                             poisson_cut=poisson_cut)
    s, s2 = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=400 * n_paths * N,
            bytes_accessed=64,
            transcendentals=20 * n_paths * N,
        ),
        interpret=interpret,
    )(pv, sc)

    n = jnp.float32(n_paths)
    return s[0, 0] / n, s2[0, 0] / n
