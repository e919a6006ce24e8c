"""Fused Forward-Euler Pallas kernels for the STATEFUL curand families.

The reference's RNG timing ladder is measured on its fast kernels —
``NMCH_FE_K3_MM<curandStateXORWOW_t>`` is its default *and fastest*
row (XORWOW 53.238 ms vs Philox 72-85 ms at 2^19 x 10^4,
``profilings/timings.txt:31-34``, ``include/NMCH/methods/
NMCH_FE.hpp:139-140``).  Rounds 1-4 rebuilt xorwow/mrg32k3a only in
the golden scan engine; this module gives them the same fused-VMEM
fast engine the counter families have, so the family-vs-family ladder
can be reproduced at speed (benchmarks/ladder.py).

Design (vs the reference's state-array kernels):

* the 6-word recurrence state (x,y,z,w,v,d for xorwow; s1||s2 for
  MRG32k3a) is a (6, rows, 128) u32 VMEM block per tile, carried
  through the N-step ``fori_loop`` in registers — the analogue of K3
  copying curand states into shared memory (``NMCH_FE.cu:247-304``);
* the kernel RETURNS the advanced states (curand's global-memory
  write-back, ``NMCH_FE.cu:29,81,303``); the method layer then rides
  them onto the next epoch's stream boundary with ONE dense jump
  (``advance_state`` by ``2^EPOCH_LOG2 - D`` where D =
  ``draws_per_compute(N)`` is the FIXED per-call consumption — FE has
  no rejection sampling), so successive ``compute()`` calls land on
  exactly the scan engine's (seed, path, epoch) skip-ahead layout
  without re-running the per-path init skip-ahead;
* stream resume from a (seed, epoch) checkpoint therefore needs no
  state dump: ``fe_stateful_state(rng, seed, n_paths, epoch)``
  re-derives the epoch's boundary state exactly.

Draw/consumption contract AND epoch layout are shared with the scan
engines (ops/fe_mrg.py / ops/fe_xorwow.py: 4 recurrence outputs per
counter block drive two Box-Muller pairs; epochs at e * 2^40 within
each path's 2^67 block), so kernel and golden engine are bitwise
identical at every epoch (tested in tests/test_fe.py's stateful
section and tests/test_tpu_hw.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fe import fe_consts, fe_two_steps, path_index_grid
from .fe_mrg import _draw_normal4 as _draw_mrg
from .fe_xorwow import _draw_normal4 as _draw_xorwow
from .fe_pallas import _kahan_add, _pick_tile_rows
from .sampling import stream_state_init

LANES = 128
N_STATE = 6          # u32 state words, both families


def draws_per_compute(N: int) -> int:
    """Recurrence steps consumed per path per FE pricing call: 4 per
    counter block, ceil(N/2) blocks (the block contract both engines
    share — odd-N tails are masked but their draws are still taken)."""
    return 4 * ((N + 1) // 2)


def _drawn(rng: str, st):
    """(g0..g3), new 6-word state — shared with the scan engines."""
    if rng == "mrg32k3a":
        (g0, g1, g2, g3), s1, s2 = _draw_mrg(st[:3], st[3:])
        return (g0, g1, g2, g3), s1 + s2
    (g0, g1, g2, g3), s, d = _draw_xorwow(st[:5], st[5])
    return (g0, g1, g2, g3), s + (d,)


def _fe_stateful_kernel(pv_ref, state_ref, sum_ref, sumsq_ref,
                        state_out_ref, comp_ref, *, N: int, rows: int,
                        rng: str):
    """One grid program: simulate a (rows, 128) tile of paths from its
    carried recurrence states; write the advanced states back."""
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

    st0 = tuple(state_ref[w] for w in range(N_STATE))
    S0 = jnp.full((rows, LANES), 1.0, jnp.float32) * S_0
    v0 = jnp.full((rows, LANES), 1.0, jnp.float32) * v_0

    n_blocks = (N + 1) // 2

    def body(j, carry):
        S, v = carry[0], carry[1]
        st = carry[2:]
        (g0, g1, g2, g3), st = _drawn(rng, st)
        S, v = fe_two_steps(S, v, g0, g1, g2, g3, j, cst, N)
        return (S, v) + st

    out = lax.fori_loop(0, n_blocks, body, (S0, v0) + st0)
    S, st = out[0], out[2:]
    for w in range(N_STATE):
        state_out_ref[w] = st[w]

    payoff = jnp.maximum(S - S_0, 0.0)      # ATM strike K = S_0
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


@functools.partial(jax.jit, static_argnames=("rng", "seed", "n_paths"))
def fe_stateful_state(rng: str, seed: int, n_paths: int, epoch=0):
    """Initial per-path states at (seed, path, epoch): u32[(6, R, 128)].

    The analogue of the reference's curand-init kernel (7 ms,
    ``profilings/FE_B_MMng:19``) — matrix skip-ahead at curand's 2^67
    subsequence spacing (rng/mrg32k3a.py / rng/xorwow.py), run ONCE at
    init(); the kernel's write-back continues the streams from there.
    """
    pidx = path_index_grid(n_paths).astype(jnp.uint32)
    st = stream_state_init(rng, seed, pidx, jnp.asarray(epoch, jnp.uint32))
    return jnp.stack(st)


def epoch_stride(rng: str) -> int:
    """Recurrence steps between successive epochs of one path's stream
    (the scan engines' layout: epoch e starts at e * 2^EPOCH_LOG2
    within the path's block — rng/xorwow.py / rng/mrg32k3a.py)."""
    if rng == "xorwow":
        from ..rng.xorwow import EPOCH_LOG2
    else:
        from ..rng.mrg32k3a import EPOCH_LOG2
    return 1 << EPOCH_LOG2


@functools.lru_cache(maxsize=8)
def _host_jump_table(rng: str, n_steps: int):
    """Exact host-side n_steps-step jump, as device-applicable tables.

    Cached: the per-compute boundary jump reuses the same
    (rng, 2^EPOCH_LOG2 - D) table every call."""
    if rng == "xorwow":
        from ..rng.xorwow import _mat_pow, N_WORDS, WEYL
        P = _mat_pow(n_steps)
        tab = np.empty((N_WORDS, 32, N_WORDS), dtype=np.uint32)
        for wi in range(N_WORDS):
            for b in range(32):
                col = P[32 * wi + b]
                for wo in range(N_WORDS):
                    tab[wi, b, wo] = (col >> (32 * wo)) & 0xFFFFFFFF
        d_inc = np.uint32((WEYL * n_steps) & 0xFFFFFFFF)
        return tab, d_inc
    from ..rng.mrg32k3a import _mat_pow, _A1, _A2, M1, M2
    J1 = np.array(_mat_pow(_A1, n_steps, M1), dtype=np.uint32)
    J2 = np.array(_mat_pow(_A2, n_steps, M2), dtype=np.uint32)
    return J1, J2


@functools.partial(jax.jit, static_argnames=("rng", "n_steps"))
def advance_state(rng: str, state, n_steps: int):
    """Jump every lane's state forward by n_steps recurrence steps.

    Jitted (rng/n_steps static): the method layer applies the
    per-compute epoch-boundary jump through this, and an eager run
    would cost one tunneled-TPU RPC per modular op for the mrg
    mat-vec.  The host matrix power runs at trace time (and is
    lru-cached in _host_jump_table across shapes/processes).

    n_steps is static (host matrix power, exact big-int arithmetic);
    the device pass is one dense mat-vec per lane.  Used by the method
    layer to ride a post-kernel state (D = draws_per_compute(N) steps
    into epoch e's block) onto the next epoch boundary:
    ``advance_state(rng, st, epoch_stride(rng) - D)`` ==
    ``fe_stateful_state(rng, seed, n_paths, e + 1)`` bitwise.
    """
    if rng == "xorwow":
        tab, d_inc = _host_jump_table(rng, n_steps)
        tabc = jnp.asarray(tab)
        s = tuple(state[w] for w in range(5))

        def inner(b, acc):
            cols = tabc[:, b, :]
            new = acc
            for wi in range(5):
                bit = (s[wi] >> b) & np.uint32(1)
                mask = np.uint32(0) - bit
                new = tuple(aw ^ (mask & cols[wi, wo])
                            for wo, aw in enumerate(new))
            return new

        jumped = lax.fori_loop(
            0, 32, inner, tuple(jnp.zeros_like(w) for w in s))
        return jnp.stack(jumped + (state[5] + d_inc,))
    from ..rng.mrg32k3a import _matvec_dyn, M1, M2, _C1, _C2
    J1, J2 = _host_jump_table(rng, n_steps)
    s1 = _matvec_dyn(jnp.asarray(J1), tuple(state[w] for w in range(3)),
                     M1, _C1)
    s2 = _matvec_dyn(jnp.asarray(J2), tuple(state[w] for w in range(3, 6)),
                     M2, _C2)
    return jnp.stack(s1 + s2)


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "tile_rows",
                                             "rng", "interpret"))
def fe_moments_stateful_pallas(params_vec, state, *, N: int, n_paths: int,
                               rng: str = "xorwow",
                               tile_rows: int | None = None,
                               interpret: bool = False):
    """(E[X], E[X^2], advanced_state) over n_paths FE paths.

    state: u32[(6, n_paths//128, 128)] from ``fe_stateful_state`` (or a
    previous call's third output — sequential stream continuation,
    curand write-back parity)."""
    if rng not in ("mrg32k3a", "xorwow"):
        raise ValueError(f"rng={rng!r}: this kernel hosts the stateful "
                         f"families only (counter rngs: ops/fe_pallas.py)")
    if n_paths % LANES:
        raise ValueError(f"n_paths={n_paths} must be a multiple of {LANES}")
    total_rows = n_paths // LANES
    # 6 extra live u32 words per lane vs the counter kernel -> smaller
    # default tile (same reasoning as EM's 64, fe_pallas tile ladder)
    rows = tile_rows or _pick_tile_rows(total_rows, target=64)
    if total_rows % rows:
        raise ValueError(f"tile_rows={rows} must divide {total_rows}")
    grid = total_rows // rows

    pv = params_vec.astype(jnp.float32)
    kern = functools.partial(_fe_stateful_kernel, N=N, rows=rows, rng=rng)
    s, s2, st_out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((N_STATE, rows, LANES), lambda i: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((N_STATE, rows, LANES), lambda i: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N_STATE, total_rows, LANES), jnp.uint32),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=40 * n_paths * N,
            bytes_accessed=2 * N_STATE * 4 * n_paths + 64,
            transcendentals=3 * n_paths * N,
        ),
        interpret=interpret,
    )(pv, state)

    n = jnp.float32(n_paths)
    return s[0, 0] / n, s2[0, 0] / n, st_out
