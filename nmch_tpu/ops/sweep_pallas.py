"""Batched parameter-grid FE sweep — one kernel launch for the whole grid.

The reference's ``exploration`` runs one kernel launch per (k, theta,
sigma) point (``exploration.cu:71-88``); SURVEY.md §7.8 calls for the
TPU-native alternative: a *vmapped grid*.

Layout (the part that makes it fast): parameter points ride the
**lane axis** and paths ride the **row axis**, so every VPU op advances
128 points x rows paths at once — full-width tiles, no small-tile
latency stalls.  Per-point parameters are (1, 128) vectors broadcast
across rows; per-point stream epochs are a lane iota, so point ``p``
uses epoch ``epoch0 + p`` exactly like sequential compute() calls.
Grid = (point_tiles, path_tiles) with path_tiles innermost: each
point-tile's (8, 128) output block stays resident while path tiles
accumulate into row 0.

A first implementation ran one small program per point (200 programs of
(40, 128) tiles) and was ~100x slower than this — the per-iteration
dependency chain is latency-bound when a tile is only a few vregs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rng.philox import philox4x32, split_seed
from ..rng.threefry4 import draw4_threefry4
from ..rng.normal import normal4_from_bits
from .fe import fe_consts, fe_step, fe_moments_scan
from .fe_pallas import _pick_tile_rows
from .em import (
    em_terminal_core, em_path_law, em_conditional_payoff, em_moments_scan,
)

LANES = 128


def _kahan_row_add(ref, y):
    """Per-lane Kahan add of the (1, 128) row ``y`` into ``ref`` row 0,
    compensation carried in ref row 1 (rows 1..7 of the per-point
    output block are otherwise unused; extraction reads row 0).  Same
    guarantee as the single-point kernels' _kahan_add (fe_pallas.py):
    per-point sums stay ~ulp-exact across any number of path tiles."""
    yc = y - ref[1:2, :]
    t = ref[0:1, :] + yc
    ref[1:2, :] = (t - ref[0:1, :]) - yc
    ref[0:1, :] = t


def _fe_sweep_kernel(pv_ref, sc_ref, sum_ref, sumsq_ref, *, N: int,
                     rows: int, rng: str):
    """Program (pt, it): paths [it*rows, (it+1)*rows) of the 128 points
    in point-tile pt.

    pv_ref:  VMEM (8, 128) — parameter j of point-lane l at [j, l]
    sc_ref:  SMEM u32[4]   — (k0, k1, epoch0, pt_base) ; pt_base unused
    sum_ref/sumsq_ref: VMEM (8, 128) — row 0 accumulates per-lane sums
    """
    pt = pl.program_id(0)
    it = pl.program_id(1)

    pv = pv_ref[...]
    T = pv[0:1, :]
    S_0 = pv[1:2, :]
    v_0 = pv[2:3, :]
    r = pv[3:4, :]
    k = pv[4:5, :]
    rho = pv[5:6, :]
    theta = pv[6:7, :]
    sigma = pv[7:8, :]

    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    # per-lane (1, 128) constant columns, hoisted out of the step loop
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt)

    k0 = sc_ref[0]
    k1 = sc_ref[1]
    # per-point epochs: lanes are points
    lane = lax.broadcasted_iota(jnp.uint32, (1, LANES), 1)
    epoch = sc_ref[2] + pt.astype(jnp.uint32) * np.uint32(LANES) + lane
    # per-path stream ids: rows are paths
    row = lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    path_lo = row + it.astype(jnp.uint32) * np.uint32(rows)
    path_hi = jnp.zeros((rows, 1), jnp.uint32)

    if rng == "tpu":
        # two-seed-word scheme, aligned with ops/fe_pallas.py: the
        # (epoch0, point-tile) identity and the path-tile identity live
        # in *separate* seed words, so replaying a stream needs a
        # simultaneous 64-bit match — not a 32-bit sum collision.
        pltpu.prng_seed(k0 ^ k1 ^ (sc_ref[2] + pt.astype(jnp.uint32))
                        * np.uint32(0x9E3779B9),
                        it.astype(jnp.uint32) * np.uint32(0x85EBCA6B))

    ones = jnp.full((rows, LANES), 1.0, jnp.float32)
    S = ones * S_0
    v = ones * v_0
    n_blocks = (N + 1) // 2

    def body(j, carry):
        S, v = carry
        if rng == "philox":
            bits = philox4x32(jnp.full((), j, jnp.uint32), epoch,
                              path_lo, path_hi, k0, k1)
        elif rng == "threefry4":
            bits = draw4_threefry4(jnp.full((), j, jnp.uint32), epoch,
                                   path_lo, k0, k1, path_hi=path_hi)
        elif rng == "tpu":
            bits = [pltpu.prng_random_bits((rows, LANES)).astype(jnp.uint32)
                    for _ in range(4)]
        else:  # unreachable: fe_sweep_pallas validates rng
            raise ValueError(f"unknown rng {rng!r}")
        g0, g1, g2, g3 = normal4_from_bits(*bits)
        S, v = fe_step(S, v, g0, g1, cst)
        if N % 2 == 0:
            S, v = fe_step(S, v, g2, g3, cst)
        else:
            do = (2 * j + 1) < N
            S2, v2 = fe_step(S, v, g2, g3, cst)
            S = jnp.where(do, S2, S)
            v = jnp.where(do, v2, v)
        return S, v

    S, _ = lax.fori_loop(0, n_blocks, body, (S, v))
    payoff = jnp.maximum(S - S_0, 0.0)

    @pl.when(it == 0)
    def _():
        sum_ref[...] = jnp.zeros((8, LANES), jnp.float32)
        sumsq_ref[...] = jnp.zeros((8, LANES), jnp.float32)

    _kahan_row_add(sum_ref, jnp.sum(payoff, axis=0, keepdims=True))
    _kahan_row_add(sumsq_ref,
                   jnp.sum(payoff * payoff, axis=0, keepdims=True))


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "n_points",
                                             "tile_rows", "rng",
                                             "interpret"))
def fe_sweep_pallas(params_matrix, seed_words, epoch0, *, N: int,
                    n_paths: int, n_points: int,
                    tile_rows: int | None = None, rng: str = "philox",
                    interpret: bool = False):
    """(E[X], E[X^2]) per parameter point, one kernel launch.

    params_matrix: f32[n_points, 8] rows of
    (T, S_0, v_0, r, k, rho, theta, sigma).
    Returns two f32[n_points] arrays.  n_paths is per point.
    """
    if rng not in ("philox", "threefry4", "tpu"):
        raise ValueError(f"unknown rng {rng!r} for fe_sweep_pallas "
                         f"(expected 'philox', 'threefry4' or 'tpu'; "
                         f"'threefry' has no sweep-kernel path)")
    if rng == "tpu" and interpret:
        raise ValueError("rng='tpu' requires real TPU hardware")
    pt_tiles = -(-n_points // LANES)
    n_pad = pt_tiles * LANES
    # pad point rows by repeating the last row (results discarded)
    pad = jnp.broadcast_to(params_matrix[-1:], (n_pad - n_points, 8))
    pm = jnp.concatenate([params_matrix.astype(jnp.float32),
                          pad.astype(jnp.float32)], axis=0)
    # -> (pt_tiles, 8, LANES): parameter j of lane l in tile t
    pmT = pm.reshape(pt_tiles, LANES, 8).transpose(0, 2, 1)
    pmT = pmT.reshape(pt_tiles * 8, LANES)

    rows = tile_rows or _pick_tile_rows(n_paths, target=256)
    path_tiles = n_paths // rows

    sc = jnp.stack([
        seed_words[0].astype(jnp.uint32),
        seed_words[1].astype(jnp.uint32),
        jnp.asarray(epoch0, jnp.uint32),
        jnp.uint32(0),
    ])

    kern = functools.partial(_fe_sweep_kernel, N=N, rows=rows, rng=rng)
    s, s2 = pl.pallas_call(
        kern,
        grid=(pt_tiles, path_tiles),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pt_tiles * 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((pt_tiles * 8, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(pmT, sc)

    # row 0 of each (8, LANES) block holds the sums
    s = s.reshape(pt_tiles, 8, LANES)[:, 0, :].reshape(-1)[:n_points]
    s2 = s2.reshape(pt_tiles, 8, LANES)[:, 0, :].reshape(-1)[:n_points]
    n = jnp.float32(n_paths)
    return s / n, s2 / n


def fe_sweep_scan(params_matrix, seed: int, epoch0: int, *, N: int,
                  n_paths: int):
    """Golden batched sweep: vmap of the scan engine over parameter rows
    (each row at its own epoch) — the CPU/test oracle for the kernel.

    Stream layout matches the kernel: path ids are 0..n_paths-1 laid out
    as a single column (the kernel's row axis), epochs are epoch0 + row
    index.
    """
    k0, k1 = split_seed(seed)
    pidx = jnp.arange(n_paths, dtype=jnp.uint32).reshape(n_paths, 1)

    def one(pv, ep):
        return fe_moments_scan(pv, N, pidx, ep, k0, k1)

    eps = jnp.uint32(epoch0) + jnp.arange(params_matrix.shape[0],
                                          dtype=jnp.uint32)
    return jax.vmap(one)(params_matrix.astype(jnp.float32), eps)


def _em_sweep_kernel(pv_ref, sc_ref, sum_ref, sumsq_ref, *, N: int,
                     rows: int, rng: str = "philox",
                     conditional: bool = False,
                     poisson_cut: float | None = None):
    """EM analogue of _fe_sweep_kernel: points in lanes, paths in rows.

    Reuses em_terminal_core with (1, 128) per-lane parameter columns and
    per-lane stream epochs.
    """
    pt = pl.program_id(0)
    it = pl.program_id(1)

    pv = pv_ref[...]                       # (8, 128)
    params = tuple(pv[j:j + 1, :] for j in range(8))

    k0 = sc_ref[0]
    k1 = sc_ref[1]
    lane = lax.broadcasted_iota(jnp.uint32, (1, LANES), 1)
    epoch = sc_ref[2] + pt.astype(jnp.uint32) * np.uint32(LANES) + lane
    # full-2D anchor: the sampler while-loop carries inherit their
    # Mosaic register layout from path_lo; a (rows,1)-derived broadcast
    # is lane-REPLICATED and the lane-varying updates can't relayout
    # back into it (see ops/sampling.py docstring). The 2-D iota sum is
    # zero after >>31 but carries the full per-lane layout.
    rr = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 0)
    cc = lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
    anchor = (rr * np.uint32(LANES) + cc) >> np.uint32(31)
    row = lax.broadcasted_iota(jnp.uint32, (rows, 1), 0)
    path_lo = row + it.astype(jnp.uint32) * np.uint32(rows) + anchor
    path_hi = path_lo * np.uint32(0)

    if conditional:
        m, sig_eff, _, _, _ = em_path_law(params, N, path_lo, path_hi,
                                          epoch, k0, k1, rng=rng,
                                          poisson_cut=poisson_cut)
        payoff = em_conditional_payoff(m, sig_eff, params[1])
    else:
        S_T, _, _, _ = em_terminal_core(params, N, path_lo, path_hi,
                                        epoch, k0, k1, rng=rng,
                                        poisson_cut=poisson_cut)
        payoff = jnp.maximum(S_T - params[1], 0.0)   # K = S_0

    @pl.when(it == 0)
    def _():
        sum_ref[...] = jnp.zeros((8, LANES), jnp.float32)
        sumsq_ref[...] = jnp.zeros((8, LANES), jnp.float32)

    _kahan_row_add(sum_ref, jnp.sum(payoff, axis=0, keepdims=True))
    _kahan_row_add(sumsq_ref,
                   jnp.sum(payoff * payoff, axis=0, keepdims=True))


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "n_points",
                                             "tile_rows", "interpret",
                                             "rng", "conditional",
                                             "poisson_cut"))
def em_sweep_pallas(params_matrix, seed_words, epoch0, *, N: int,
                    n_paths: int, n_points: int,
                    tile_rows: int | None = None, interpret: bool = False,
                    rng: str = "philox", conditional: bool = False,
                    poisson_cut: float | None = None):
    """(E[X], E[X^2]) per parameter point for the EM scheme, one launch.

    rng="threefry4" and conditional=True compose with the batched
    layout exactly as in the single-point kernel (methods/em.py).
    poisson_cut=None keeps curand's 4000 switch-over (ops-layer parity
    default, like em_moments_pallas); the fast 128 is a method-layer
    decision — methods/em.py and explore.py pass it explicitly."""
    if rng not in ("philox", "threefry4"):
        raise ValueError(f"unknown rng {rng!r} for em_sweep_pallas "
                         f"(the rejection samplers consume lane-local "
                         f"counter streams: 'philox' or 'threefry4')")
    pt_tiles = -(-n_points // LANES)
    n_pad = pt_tiles * LANES
    pad = jnp.broadcast_to(params_matrix[-1:], (n_pad - n_points, 8))
    pm = jnp.concatenate([params_matrix.astype(jnp.float32),
                          pad.astype(jnp.float32)], axis=0)
    pmT = pm.reshape(pt_tiles, LANES, 8).transpose(0, 2, 1)
    pmT = pmT.reshape(pt_tiles * 8, LANES)

    # EM carries much more live state (sampler rounds), smaller tiles
    rows = tile_rows or _pick_tile_rows(n_paths, target=128)
    path_tiles = n_paths // rows

    sc = jnp.stack([
        seed_words[0].astype(jnp.uint32),
        seed_words[1].astype(jnp.uint32),
        jnp.asarray(epoch0, jnp.uint32),
        jnp.uint32(0),
    ])

    kern = functools.partial(_em_sweep_kernel, N=N, rows=rows, rng=rng,
                             poisson_cut=poisson_cut,
                             conditional=conditional)
    s, s2 = pl.pallas_call(
        kern,
        grid=(pt_tiles, path_tiles),
        in_specs=[
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda pt, it: (pt, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pt_tiles * 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((pt_tiles * 8, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(pmT, sc)

    s = s.reshape(pt_tiles, 8, LANES)[:, 0, :].reshape(-1)[:n_points]
    s2 = s2.reshape(pt_tiles, 8, LANES)[:, 0, :].reshape(-1)[:n_points]
    n = jnp.float32(n_paths)
    return s / n, s2 / n


def em_sweep_scan(params_matrix, seed: int, epoch0: int, *, N: int,
                  n_paths: int, rng: str = "philox",
                  conditional: bool = False,
                  poisson_cut: float | None = None):
    """Golden batched EM sweep (vmap over rows, epoch per row).

    poisson_cut default mirrors em_sweep_pallas (None = curand's 4000)
    so the two stay draw-for-draw comparable at any lambda."""
    k0, k1 = split_seed(seed)
    pidx = jnp.arange(n_paths, dtype=jnp.uint32).reshape(n_paths, 1)

    def one(pv, ep):
        return em_moments_scan(pv, N, pidx, ep, k0, k1, rng=rng,
                               conditional=conditional,
                               poisson_cut=poisson_cut)

    eps = jnp.uint32(epoch0) + jnp.arange(params_matrix.shape[0],
                                          dtype=jnp.uint32)
    return jax.vmap(one)(params_matrix.astype(jnp.float32), eps)
