"""Pathwise Greeks by automatic differentiation through the simulator.

A capability the CUDA reference cannot express: because the whole FE
engine is a pure JAX function of the parameter vector (``ops/fe.py``
takes params as a TRACED f32[8]), ``jax.grad`` differentiates the
price estimator through all N Euler steps — the *pathwise derivative*
estimator (Glasserman, "Monte Carlo Methods in Financial Engineering",
ch. 7) with zero extra code: same draws, same kernel math, exact
sensitivities of the discretized estimator.

    delta = dP/dS_0,  vega = dP/dsigma,  rho_r = dP/dr,
    plus dP/dv_0, dP/dkappa, dP/dtheta, dP/drho.

Validity: the ATM-call payoff (S_T - K)^+ is Lipschitz and a.e.
differentiable, and S_T has a density under the Heston/Euler law, so
the pathwise estimator is unbiased for all first-order Greeks above
(the kink at S_T = K has measure zero).  It would NOT be valid for
digital payoffs — that needs the likelihood-ratio method.

The strike is pinned K = S_0 by the reference's design (NMCH.hpp ctor
sets K(S_0)); delta here therefore differentiates BOTH the spot and
the strike (the reference's "ATM-homogeneous" contract).  For the
classic fixed-strike delta, pass ``fix_strike=True``, which freezes K
at its input value.

Reverse-mode AD through the N-step ``fori_loop`` is O(N) memory for
the tape; ``jax.checkpoint`` on the step body (remat) brings it to
O(sqrt-ish) at ~2x flops — enabled by default for N > 512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .fe import fe_consts, fe_two_steps, make_draw4, path_index_grid
from ..rng.normal import normal4_from_bits

PARAM_NAMES = ("T", "S_0", "v_0", "r", "k", "rho", "theta", "sigma")


def _fe_price_scan(params_vec, K, N: int, path_idx, epoch, k0, k1,
                   rng: str, remat: bool):
    """Differentiable price: mean of (S_T - K)^+ over the paths.

    Reimplements ops/fe.py::fe_terminal's loop with lax.scan (scan has
    a native, efficient transpose rule; fori_loop reverse-mode relies
    on the same machinery but scan keeps the tape layout explicit) and
    an optional remat'd body.  Consumes the SAME draws as fe_terminal
    (block j -> steps 2j, 2j+1), so price == fe_moments_scan's price.
    """
    T, S_0, v_0, r, k, rho, theta, sigma = (params_vec[i]
                                            for i in range(8))
    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt)

    path_lo = path_idx.astype(jnp.uint32)
    path_hi = jnp.zeros_like(path_lo)
    ep = jnp.asarray(epoch, jnp.uint32)
    draw = make_draw4(rng, path_lo, path_hi, ep, k0, k1)

    S0 = jnp.full(path_idx.shape, 1.0, jnp.float32) * S_0
    v0 = jnp.full(path_idx.shape, 1.0, jnp.float32) * v_0
    n_blocks = (N + 1) // 2

    def body(carry, j):
        S, v = carry
        bits = draw(j.astype(jnp.uint32))
        g0, g1, g2, g3 = normal4_from_bits(*bits)
        S, v = fe_two_steps(S, v, g0, g1, g2, g3, j, cst, N)
        return (S, v), None

    if remat:
        body = jax.checkpoint(body)
    (S, _), _ = lax.scan(body, (S0, v0), jnp.arange(n_blocks))
    payoff = jnp.maximum(S - K, 0.0)
    return jnp.sum(payoff) / jnp.float32(payoff.size)


@functools.partial(jax.jit,
                   static_argnames=("N", "n_paths", "rng", "fix_strike",
                                    "remat"))
def fe_price_and_greeks(params_vec, epoch, k0, k1, *, N: int,
                        n_paths: int, rng: str = "philox",
                        fix_strike: bool = False,
                        remat: bool | None = None):
    """(price, greeks): greeks is a dict over PARAM_NAMES of pathwise
    dPrice/dparam at the given (seed, epoch) draws.

    fix_strike: freeze K at the incoming S_0 (classic fixed-strike
    delta) instead of the reference's K = S_0 coupling.
    """
    if remat is None:
        remat = N > 512
    pidx = path_index_grid(n_paths)

    def price_of(pv):
        Kv = lax.stop_gradient(pv[1]) if fix_strike else pv[1]
        return _fe_price_scan(pv, Kv, N, pidx, epoch, k0, k1, rng, remat)

    price, grads = jax.value_and_grad(price_of)(params_vec)
    return price, dict(zip(PARAM_NAMES, grads))


@functools.partial(jax.jit,
                   static_argnames=("N", "n_paths", "rng", "fix_strike",
                                    "remat"))
def fe_greeks_sweep(params_matrix, epoch0, k0, k1, *, N: int,
                    n_paths: int, rng: str = "philox",
                    fix_strike: bool = False,
                    remat: bool | None = None):
    """(prices f32[P], grads f32[P, 8]): the pathwise-Greeks surface
    over a whole parameter grid in one compiled program — vmap over
    grid rows x grad over parameters x scan over time, the transform
    composition the CUDA reference's per-kernel design cannot express.

    Row p prices with stream epoch ``epoch0 + p`` (the batched-sweep
    epoch convention, ops/sweep_pallas.py).  Column order of grads is
    PARAM_NAMES.  Cost scales like the sweep itself (~2x a price-only
    sweep); use it to map delta/vega stability across the
    (kappa, theta, sigma) exploration grid.
    """
    if remat is None:
        remat = N > 512
    pidx = path_index_grid(n_paths)

    def one(pv, ep):
        def price_of(p):
            Kv = lax.stop_gradient(p[1]) if fix_strike else p[1]
            return _fe_price_scan(p, Kv, N, pidx, ep, k0, k1, rng,
                                  remat)
        return jax.value_and_grad(price_of)(pv)

    eps = jnp.asarray(epoch0, jnp.uint32) + jnp.arange(
        params_matrix.shape[0], dtype=jnp.uint32)
    return jax.vmap(one)(params_matrix.astype(jnp.float32), eps)
