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
from ..rng.threefry4 import draw4_threefry4
from ..rng.normal import normal4_from_bits, normal4_from_bits3
from .fe import fe_consts, fe_rot_group_step

LANES = 128


def _kahan_add(acc_ref, comp_ref, slot: int, val):
    """Compensated scalar accumulation across the sequential grid.

    Two f32 words (sum, compensation) give ~2^-48 effective precision —
    the TPU-native answer to SURVEY §7's f64-accumulation hard part
    (the VPU has no native f64; Kahan costs 4 scalar ops per tile).
    Deterministic: the grid is sequential, unlike the reference's
    float atomicAdd (NMCH_FE.cu:74-78)."""
    y = val - comp_ref[slot]
    t = acc_ref[0, 0] + y
    comp_ref[slot] = (t - acc_ref[0, 0]) - y
    acc_ref[0, 0] = t


def _fe_kernel(pv_ref, sc_ref, sum_ref, sumsq_ref, comp_ref, *, N: int,
               rows: int, rng: str = "philox", rot: int = 1,
               box: str = "hc", unroll: int = 1, fast_sqrt: bool = False):
    """One grid program simulates a (rows, 128) tile of paths.

    pv_ref: SMEM f32[8]  — (T, S_0, v_0, r, k, rho, theta, sigma)
    sc_ref: SMEM u32[4]  — (k0, k1, epoch, base_path)
    sum_ref/sumsq_ref: SMEM f32[1,1] — global accumulators over the grid

    rng="philox": counter-based streams, bitwise-identical to the golden
    engine (the default, mirroring the reference's Philox kernels);
    rng="threefry"/"threefry4": faster counter generators with the same
    bitwise cross-engine parity (threefry4 is the fast reproducible
    choice — 3.2x philox, benchmarks/RESULTS.md ladder).
    rng="tpu": the TPU core's hardware PRNG (pltpu.prng_random_bits) —
    the fastest engine (56.6 G at rot=1, 120+ G at rot=4 on v5e),
    still deterministic per (seed, epoch, tile), but its bitstream is
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
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt)

    k0 = sc_ref[0]
    k1 = sc_ref[1]
    epoch = sc_ref[2]
    base = sc_ref[3] + i.astype(jnp.uint32) * np.uint32(rows * LANES)

    if rng in ("philox", "threefry", "threefry4"):
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
    # golden==kernel contract is unaffected.  unroll=0: auto — largest
    # power of two <= 8 dividing n_blocks for the hardware PRNG
    # (measured +3% on v5e), but 1 for the counter-based rngs: their
    # inlined round ladders already dominate Mosaic's compile time
    # (~80-200 s for philox), and unrolling multiplies the body size
    # for no measured runtime gain.
    if unroll:
        U = unroll if n_blocks % unroll == 0 else 1
    elif rng == "tpu":
        U = max(u for u in (8, 4, 2, 1) if n_blocks % u == 0)
    else:
        U = 1
    n_iters = n_blocks // U

    def draw_block(bi):
        """4 uint32 words for counter block bi (counter-based rngs)."""
        if rng == "philox":
            return philox4x32(bi, epoch, path_lo, path_hi, k0, k1)
        if rng == "threefry4":
            return draw4_threefry4(bi, epoch, path_lo, k0, k1,
                                   path_hi=path_hi)
        return draw4_threefry(bi, epoch, path_lo, k0, k1)

    def draw_iter(j):
        """U blocks of 4 normals for iteration j."""
        if rng == "tpu":
            # one fused generation for all words of the iteration;
            # box="hc16" packs both pairs' phases into one word
            # (3 words per block instead of 4 — normal4_from_bits3)
            wpb = 3 if box in ("hc16", "hc16f") else 4
            allb = pltpu.prng_random_bits((wpb * U * rows, LANES)) \
                .astype(jnp.uint32)
            words = [allb[wpb * t * rows:(wpb * t + wpb) * rows]
                     for t in range(U)]
            if wpb == 3:
                # rot > 4: the construction also emits each pair's
                # radius-antithetic scale (u is at hand — saves the
                # exp the shared (a,b)-derived form pays)
                return [normal4_from_bits3(w[0 * rows:1 * rows],
                                           w[1 * rows:2 * rows],
                                           w[2 * rows:3 * rows],
                                           fast=(box == "hc16f"),
                                           with_scale=rot > 4)
                        for w in words]
            return [normal4_from_bits(w[0 * rows:1 * rows],
                                      w[1 * rows:2 * rows],
                                      w[2 * rows:3 * rows],
                                      w[3 * rows:4 * rows], box=box)
                    for w in words]
        base_bi = jnp.full((), 0, jnp.uint32) + (j * U).astype(jnp.uint32)
        return [normal4_from_bits(*draw_block(base_bi + np.uint32(t)),
                                  box=box) for t in range(U)]

    def block_steps(bi, pairs, Ss, vs):
        """Advance all rot copies through counter block bi (2 steps);
        copy t sees rotation_images(., ., rot)[t] of the shared draws —
        via fe_rot_group_step's shared rotation algebra."""
        if len(pairs) == 6:        # with_scale construction (hc16*)
            g0, g1, g2, g3, sc0, sc1 = pairs
        else:
            g0, g1, g2, g3 = pairs
            sc0 = sc1 = None
        Ss, vs = fe_rot_group_step(Ss, vs, g0, g1, cst, rot,
                                   fast_sqrt=fast_sqrt, scale=sc0)
        if N % 2 == 0:
            Ss, vs = fe_rot_group_step(Ss, vs, g2, g3, cst, rot,
                                       fast_sqrt=fast_sqrt, scale=sc1)
        else:
            do = (2 * bi + 1) < N
            S2, v2 = fe_rot_group_step(Ss, vs, g2, g3, cst, rot,
                                       fast_sqrt=fast_sqrt, scale=sc1)
            Ss = [jnp.where(do, b_, a_) for b_, a_ in zip(S2, Ss)]
            vs = [jnp.where(do, b_, a_) for b_, a_ in zip(v2, vs)]
        return Ss, vs

    def body(j, carry):
        Ss, vs = list(carry[:rot]), list(carry[rot:])
        for t, pairs in enumerate(draw_iter(j)):
            Ss, vs = block_steps(j * U + t, pairs, Ss, vs)
        return tuple(Ss) + tuple(vs)

    init = tuple(S0 for _ in range(rot)) + tuple(v0 for _ in range(rot))
    out = lax.fori_loop(0, n_iters, body, init)
    payoff = jnp.maximum(out[0] - S_0, 0.0)  # ATM strike K = S_0
    for t in range(1, rot):
        payoff = payoff + jnp.maximum(out[t] - S_0, 0.0)
    if rot > 1:
        payoff = payoff * np.float32(1.0 / rot)

    tile_sum = jnp.sum(payoff)
    tile_sumsq = jnp.sum(payoff * payoff)

    # deterministic compensated accumulation (grid runs sequentially)
    @pl.when(i == 0)
    def _():
        sum_ref[0, 0] = 0.0
        sumsq_ref[0, 0] = 0.0
        comp_ref[0] = 0.0
        comp_ref[1] = 0.0

    _kahan_add(sum_ref, comp_ref, 0, tile_sum)
    _kahan_add(sumsq_ref, comp_ref, 1, tile_sumsq)


def largest_divisor_leq(m: int, cap: int) -> int:
    """Largest divisor of m that is <= cap (cap >= 1) — the shared
    tiling/chunking utility (tile rows here, point and time chunks in
    ops/fe_qmc.py)."""
    best = 1
    d = 1
    while d * d <= m:
        if m % d == 0:
            for c in (d, m // d):
                if c <= cap and c > best:
                    best = c
        d += 1
    return best


def _pick_tile_rows(total_rows: int, target: int = 128) -> int:
    """Largest divisor of total_rows that is <= target.

    Defaults come from the measured tile ladder on v5e
    (benchmarks/fe_micro.py, recorded in benchmarks/RESULTS.md): FE
    throughput plateaus for tiles 16..128 and falls off above (live
    state exceeds what Mosaic keeps register/VMEM-resident) and below
    16 (per-program overhead).  Callers shrink ``target`` when the
    kernel carries more live state per lane (rot copies, EM samplers).
    """
    return largest_divisor_leq(total_rows, target)


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "tile_rows",
                                             "rng", "antithetic", "rot",
                                             "interpret", "box", "unroll",
                                             "fast_sqrt"))
def fe_moments_pallas(params_vec, seed_words, epoch, base_path, *,
                      N: int, n_paths: int, tile_rows: int | None = None,
                      rng: str = "philox", antithetic: bool = False,
                      rot: int | None = None,
                      interpret: bool = False, box: str = "hc",
                      unroll: int = 0, fast_sqrt: bool = False):
    """(E[X], E[X^2]) over n_paths FE path groups via the fused kernel.

    seed_words: uint32[2]; epoch/base_path: uint32 scalars (traced).
    base_path offsets the per-path stream indices — used by the
    multi-chip sharding so every chip owns a disjoint stream range.

    rot in {1, 2, 4, 8}: rotation-coupled copies per stream (see
    ops/fe.py::rotation_images) — rot=2 is antithetic variates (the
    ``antithetic`` flag is a synonym), rot=4 adds quarter-turn angle
    stratification.  Moments are over the n_paths *group means*; the
    kernel simulates rot * n_paths paths' worth of Euler steps.
    """
    if rot is None:
        rot = 2 if antithetic else 1
    elif antithetic and rot == 1:
        raise ValueError("antithetic=True contradicts rot=1 "
                         "(antithetic IS rot=2; pass one of them)")
    if rot not in (1, 2, 4, 8):
        raise ValueError(f"rot must be 1, 2, 4 or 8, got {rot}")
    if n_paths % LANES:
        raise ValueError(f"n_paths={n_paths} must be a multiple of {LANES}")
    total_rows = n_paths // LANES
    # measured optimum shrinks with live state: 128 rows for rot=1,
    # 64 for rot=2, 32 for rot=4/8 (benchmarks/RESULTS.md tile ladder)
    rows = tile_rows or _pick_tile_rows(total_rows,
                                        target=max(32, 128 // (rot or 1)))
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

    if rng not in ("philox", "threefry", "threefry4", "tpu"):
        raise ValueError(f"unknown rng {rng!r} (expected 'philox', "
                         f"'threefry', 'threefry4' or 'tpu')")
    if rng == "tpu" and interpret:
        raise ValueError("rng='tpu' requires real TPU hardware")
    if box in ("hc16", "hc16f") and rng != "tpu":
        raise ValueError(f"box={box!r} (packed 16-bit phases) only applies "
                         f"to rng='tpu': the counter-based engines keep "
                         f"the 4-word consumption contract (bitwise "
                         f"golden==kernel parity)")
    if fast_sqrt and rng != "tpu":
        raise ValueError("fast_sqrt=True (v * rsqrt(v)) only applies to "
                         "rng='tpu': rsqrt is not correctly rounded, so "
                         "the reproducible engines keep IEEE sqrt")
    kern = functools.partial(_fe_kernel, N=N, rows=rows, rng=rng,
                             rot=rot, box=box, unroll=unroll,
                             fast_sqrt=fast_sqrt)
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
            flops=15 * rot * n_paths * N,
            bytes_accessed=64,
            transcendentals=3 * n_paths * N,
        ),
        interpret=interpret,
    )(pv, sc)

    n = jnp.float32(n_paths)
    return s[0, 0] / n, s2[0, 0] / n
