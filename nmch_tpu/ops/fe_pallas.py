"""Fused Forward-Euler Pallas TPU kernel.

TPU-native re-design of the reference's FE kernel ladder
(``src/NMCH/methods/NMCH_FE.cu:6-307``):

* one CUDA thread per path            -> one VPU lane per path; paths
  tiled as (ROWS, 128) float32 blocks resident in VMEM/vregs for all
  N steps (the analogue of K3 keeping RNG state + S/v in shared
  memory/registers, ``NMCH_FE.cu:247-304``);
* curand Philox4_32_10 states          -> stateless counter-based
  Philox4x32-10 (same generator family!) evaluated on the VPU; no
  state arrays, no 7 ms init kernel (``profilings/FE_B_MMng:19``);
* blockReduceSum + atomicAdd           -> in-tile ``jnp.sum`` + scalar
  accumulation across the (sequential) TPU grid into SMEM outputs —
  deterministic, unlike float atomics (SURVEY.md §5);
* curand_normal4 2-steps-per-draw      -> one Philox block = 4 words =
  two Box–Muller pairs = two time steps (same consumption pattern as
  the golden engine in ops/fe.py, hence bitwise-identical draws).

The kernel's inputs are runtime values (SMEM scalars), so parameter
sweeps reuse one compilation, mirroring the reference's persistent
kernel across ``set_k/set_theta/set_sigma`` calls.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rng.philox import philox4x32
from ..rng.threefry import draw4_threefry
from ..rng.normal import normal4_from_bits
from .fe import fe_step

LANES = 128


def _fe_kernel(pv_ref, sc_ref, sum_ref, sumsq_ref, *, N: int, rows: int,
               rng: str = "philox", antithetic: bool = False,
               box: str = "hc", unroll: int = 1):
    """One grid program simulates a (rows, 128) tile of paths.

    pv_ref: SMEM f32[8]  — (T, S_0, v_0, r, k, rho, theta, sigma)
    sc_ref: SMEM u32[4]  — (k0, k1, epoch, base_path)
    sum_ref/sumsq_ref: SMEM f32[1,1] — global accumulators over the grid

    rng="philox": counter-based streams, bitwise-identical to the golden
    engine (the default, mirroring the reference's Philox kernels).
    rng="tpu": the TPU core's hardware PRNG (pltpu.prng_random_bits) —
    ~2x faster (measured 20.7 vs 9.4 G path-steps/s on v5e), still
    deterministic per (seed, epoch, tile), but its bitstream is
    hardware-defined, so no cross-engine bitwise parity.
    """
    i = pl.program_id(0)

    T = pv_ref[0]
    S_0 = pv_ref[1]
    v_0 = pv_ref[2]
    r = pv_ref[3]
    k = pv_ref[4]
    rho = pv_ref[5]
    theta = pv_ref[6]
    sigma = pv_ref[7]

    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)

    k0 = sc_ref[0]
    k1 = sc_ref[1]
    epoch = sc_ref[2]
    base = sc_ref[3] + i.astype(jnp.uint32) * np.uint32(rows * LANES)

    if rng in ("philox", "threefry"):
        rr = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 0)
        cc = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
        path_lo = rr * np.uint32(LANES) + cc + base
        path_hi = jnp.zeros_like(path_lo)
    else:
        # one hardware stream per (seed, epoch, tile).  epoch and tile
        # base live in *separate* seed words (epoch golden-ratio-mixed
        # into the key word, base bijectively scrambled in the other),
        # so replaying a stream requires a simultaneous 64-bit match —
        # not a 32-bit sum collision.
        pltpu.prng_seed(k0 ^ k1 ^ epoch * np.uint32(0x9E3779B9),
                        base * np.uint32(0x85EBCA6B))

    S0 = jnp.full((rows, LANES), 1.0, jnp.float32) * S_0
    v0 = jnp.full((rows, LANES), 1.0, jnp.float32) * v_0

    n_blocks = (N + 1) // 2
    # unroll U counter blocks (2U steps) per fori iteration; draws and
    # their consumption order are identical to U=1, so the bitwise
    # golden==kernel contract is unaffected.
    U = unroll if unroll and n_blocks % unroll == 0 else 1
    n_iters = n_blocks // U

    def draw_block(bi):
        """4 uint32 words for counter block bi (counter-based rngs)."""
        if rng == "philox":
            return philox4x32(bi, epoch, path_lo, path_hi, k0, k1)
        return draw4_threefry(bi, epoch, path_lo, k0, k1)

    def draw_iter(j):
        """U blocks of 4 normals for iteration j."""
        if rng == "tpu":
            # one fused generation for all 4U words of the iteration
            allb = pltpu.prng_random_bits((4 * U * rows, LANES)) \
                .astype(jnp.uint32)
            words = [allb[4 * t * rows:(4 * t + 4) * rows] for t in range(U)]
            return [normal4_from_bits(w[0 * rows:1 * rows],
                                      w[1 * rows:2 * rows],
                                      w[2 * rows:3 * rows],
                                      w[3 * rows:4 * rows], box=box)
                    for w in words]
        base_bi = jnp.full((), 0, jnp.uint32) + (j * U).astype(jnp.uint32)
        return [normal4_from_bits(*draw_block(base_bi + np.uint32(t)),
                                  box=box) for t in range(U)]

    def steps(bi, pairs, sign):
        """Two Euler steps for one state copy; sign = +/-1 antithetic."""
        g0, g1, g2, g3 = pairs

        def one(S, v, a, b):
            return fe_step(S, v, sign * a, sign * b, r, k, theta, sigma,
                           rho, sqrt_rho_c, dt, sqrt_dt)

        def two(S, v):
            S, v = one(S, v, g0, g1)
            if N % 2 == 0:
                S, v = one(S, v, g2, g3)
            else:
                do = (2 * bi + 1) < N
                S2, v2 = one(S, v, g2, g3)
                S = jnp.where(do, S2, S)
                v = jnp.where(do, v2, v)
            return S, v
        return two

    if antithetic:
        def body(j, carry):
            S_p, v_p, S_m, v_m = carry
            for t, pairs in enumerate(draw_iter(j)):
                bi = j * U + t
                S_p, v_p = steps(bi, pairs, np.float32(1.0))(S_p, v_p)
                S_m, v_m = steps(bi, pairs, np.float32(-1.0))(S_m, v_m)
            return S_p, v_p, S_m, v_m

        S_p, _, S_m, _ = lax.fori_loop(0, n_iters, body,
                                       (S0, v0, S0, v0))
        payoff = np.float32(0.5) * (jnp.maximum(S_p - S_0, 0.0)
                                    + jnp.maximum(S_m - S_0, 0.0))
    else:
        def body(j, carry):
            S, v = carry
            for t, pairs in enumerate(draw_iter(j)):
                S, v = steps(j * U + t, pairs, np.float32(1.0))(S, v)
            return S, v

        S, _ = lax.fori_loop(0, n_iters, body, (S0, v0))
        payoff = jnp.maximum(S - S_0, 0.0)  # ATM strike K = S_0

    tile_sum = jnp.sum(payoff)
    tile_sumsq = jnp.sum(payoff * payoff)

    # deterministic cross-tile accumulation (grid runs sequentially)
    @pl.when(i == 0)
    def _():
        sum_ref[0, 0] = 0.0
        sumsq_ref[0, 0] = 0.0

    sum_ref[0, 0] += tile_sum
    sumsq_ref[0, 0] += tile_sumsq


def _pick_tile_rows(total_rows: int, target: int = 512) -> int:
    """Largest divisor of total_rows that is <= target (keeps every live
    (rows, 128) f32 array ~256 KB so the loop body stays in VMEM)."""
    best = 1
    d = 1
    while d * d <= total_rows:
        if total_rows % d == 0:
            for c in (d, total_rows // d):
                if c <= target and c > best:
                    best = c
        d += 1
    return best


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "tile_rows",
                                             "rng", "antithetic",
                                             "interpret", "box", "unroll"))
def fe_moments_pallas(params_vec, seed_words, epoch, base_path, *,
                      N: int, n_paths: int, tile_rows: int | None = None,
                      rng: str = "philox", antithetic: bool = False,
                      interpret: bool = False, box: str = "hc",
                      unroll: int = 1):
    """(E[X], E[X^2]) over n_paths FE paths via the fused kernel.

    seed_words: uint32[2]; epoch/base_path: uint32 scalars (traced).
    base_path offsets the per-path stream indices — used by the
    multi-chip sharding so every chip owns a disjoint stream range.
    """
    if n_paths % LANES:
        raise ValueError(f"n_paths={n_paths} must be a multiple of {LANES}")
    total_rows = n_paths // LANES
    rows = tile_rows or _pick_tile_rows(total_rows)
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

    if rng not in ("philox", "threefry", "tpu"):
        raise ValueError(f"unknown rng {rng!r} (expected 'philox', "
                         f"'threefry' or 'tpu')")
    if rng == "tpu" and interpret:
        raise ValueError("rng='tpu' requires real TPU hardware")
    kern = functools.partial(_fe_kernel, N=N, rows=rows, rng=rng,
                             antithetic=antithetic, box=box, unroll=unroll)
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
        cost_estimate=pl.CostEstimate(
            flops=15 * n_paths * N,
            bytes_accessed=64,
            transcendentals=3 * n_paths * N,
        ),
        interpret=interpret,
    )(pv, sc)

    n = jnp.float32(n_paths)
    return s[0, 0] / n, s2[0, 0] / n
