"""Forward-Euler Heston scheme — shared step math + pure-JAX golden engine.

Discretization (reference README.md:30-40, kernel at
``src/NMCH/methods/NMCH_FE.cu:41-48``), per time step with correlated
standard normals (G1, G2):

    S <- S + r S dt + sqrt(v) S sqrt(dt) (rho G1 + sqrt(1-rho^2) G2)
    v <- | v + k (theta - v) dt + sigma sqrt(v) sqrt(dt) G1 |

Note the *reflection* ``g(.) = |.|`` (the reference uses ``abs``, not
truncation) and that the S update reads the pre-update v.  The payoff is
the undiscounted ATM call ``max(S_T - K, 0)`` — the reference never
applies ``exp(-rT)`` in the framework path (only the pre-framework
playbooks did), so neither do we.

RNG consumption contract (shared with the Pallas kernel so both engines
are bitwise-identical): counter block ``j`` of each path's Philox stream
yields 4 uint32 words -> 4 normals via two Box–Muller pairs; words
(0, 1) drive step ``2j`` and words (2, 3) drive step ``2j+1`` (the
analogue of the reference's ``curand_normal4`` trick, FE_k2_philox,
``NMCH_FE.cu:192-245``).  For odd N the final half-block is masked out.

Lane layout: paths live in (R, 128) float32 arrays (VPU-native tiling);
path index = row * 128 + lane.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..rng.philox import philox4x32
from ..rng.threefry import draw4_threefry
from ..rng.normal import normal4_from_bits


def path_index_grid(n_paths: int, base: int = 0):
    """(R, 128) uint32 path indices, base-offset for sharded meshes."""
    if n_paths % 128:
        raise ValueError(f"n_paths={n_paths} must be a multiple of 128")
    rows = n_paths // 128
    r = lax.broadcasted_iota(jnp.uint32, (rows, 128), 0)
    c = lax.broadcasted_iota(jnp.uint32, (rows, 128), 1)
    return r * np.uint32(128) + c + np.uint32(base)


def fe_step(S, v, g1, g2, r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt):
    """One Euler step (both engines call this exact function)."""
    sqv = jnp.sqrt(v)
    S = S + r * S * dt + sqv * S * sqrt_dt * (rho * g1 + sqrt_rho_c * g2)
    v = jnp.abs(v + k * (theta - v) * dt + sigma * sqv * sqrt_dt * g1)
    return S, v


def make_draw4(rng: str, path_lo, path_hi, epoch, k0, k1):
    """Block-index -> 4 uint32 words for the chosen counter-based RNG.

    rng="philox": curand-family default; rng="threefry": multiply-free,
    ~35% faster in-kernel, bit-exact with JAX's own threefry2x32
    (rng/threefry.py)."""
    if rng == "philox":
        return lambda j: philox4x32(j, epoch, path_lo, path_hi, k0, k1)
    if rng == "threefry":
        return lambda j: draw4_threefry(j, epoch, path_lo, k0, k1)
    raise ValueError(f"unknown counter rng {rng!r}")


def fe_block_body(j, S, v, path_lo, path_hi, epoch, k0, k1,
                  r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt, N: int,
                  rng: str = "philox"):
    """Advance steps 2j and 2j+1 from one counter block."""
    draw = make_draw4(rng, path_lo, path_hi, epoch, k0, k1)
    bits = draw(jnp.uint32(0) + j.astype(jnp.uint32))
    g0, g1, g2, g3 = normal4_from_bits(*bits)
    S, v = fe_step(S, v, g0, g1, r, k, theta, sigma, rho, sqrt_rho_c,
                   dt, sqrt_dt)
    if N % 2 == 0:
        S, v = fe_step(S, v, g2, g3, r, k, theta, sigma, rho, sqrt_rho_c,
                       dt, sqrt_dt)
    else:
        # mask the trailing half-block on the last iteration
        do = (2 * j + 1) < N
        S2, v2 = fe_step(S, v, g2, g3, r, k, theta, sigma, rho, sqrt_rho_c,
                         dt, sqrt_dt)
        S = jnp.where(do, S2, S)
        v = jnp.where(do, v2, v)
    return S, v


def fe_terminal(params_vec, N: int, path_idx, epoch, k0, k1,
                rng: str = "philox"):
    """Simulate all paths to maturity; returns (S_T, v_T) as (R, 128) f32.

    params_vec: f32[8] = (T, S_0, v_0, r, k, rho, theta, sigma) — traced,
    so parameter sweeps reuse one compilation.
    """
    T, S_0, v_0, r, k, rho, theta, sigma = (params_vec[i] for i in range(8))
    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)

    path_lo = path_idx.astype(jnp.uint32)
    path_hi = jnp.zeros_like(path_lo)
    ep = jnp.asarray(epoch, dtype=jnp.uint32)

    S0 = jnp.full(path_idx.shape, 1.0, jnp.float32) * S_0
    v0 = jnp.full(path_idx.shape, 1.0, jnp.float32) * v_0

    n_blocks = (N + 1) // 2

    def body(j, carry):
        S, v = carry
        return fe_block_body(j, S, v, path_lo, path_hi, ep, k0, k1,
                             r, k, theta, sigma, rho, sqrt_rho_c,
                             dt, sqrt_dt, N, rng=rng)

    S, v = lax.fori_loop(0, n_blocks, body, (S0, v0))
    return S, v


def fe_moments_scan(params_vec, N: int, path_idx, epoch, k0, k1,
                    rng: str = "philox"):
    """Golden engine: (E[X], E[X^2]) with X = (S_T - K)^+, K = S_0.

    The reference scales each payoff by 1/n before reduction
    (``NMCH_FE.cu:174-175``); we compute sum/n — identical up to
    summation order.
    """
    S_T, _ = fe_terminal(params_vec, N, path_idx, epoch, k0, k1, rng=rng)
    K = params_vec[1]  # ATM strike = S_0 (NMCH.cu:7)
    payoff = jnp.maximum(S_T - K, 0.0)
    n = jnp.float32(payoff.size)
    return jnp.sum(payoff) / n, jnp.sum(payoff * payoff) / n


def fe_antithetic_pair_body(j, S_p, v_p, S_m, v_m, path_lo, path_hi, epoch,
                            k0, k1, r, k, theta, sigma, rho, sqrt_rho_c,
                            dt, sqrt_dt, N: int, rng: str = "philox"):
    """Advance an antithetic pair: the (+) copy sees (G1, G2), the (-)
    copy sees (-G1, -G2), from the same stream draws."""
    draw = make_draw4(rng, path_lo, path_hi, epoch, k0, k1)
    bits = draw(jnp.uint32(0) + j.astype(jnp.uint32))
    g0, g1, g2, g3 = normal4_from_bits(*bits)

    def both(S_p, v_p, S_m, v_m, a, b):
        S_p, v_p = fe_step(S_p, v_p, a, b, r, k, theta, sigma, rho,
                           sqrt_rho_c, dt, sqrt_dt)
        S_m, v_m = fe_step(S_m, v_m, -a, -b, r, k, theta, sigma, rho,
                           sqrt_rho_c, dt, sqrt_dt)
        return S_p, v_p, S_m, v_m

    S_p, v_p, S_m, v_m = both(S_p, v_p, S_m, v_m, g0, g1)
    if N % 2 == 0:
        S_p, v_p, S_m, v_m = both(S_p, v_p, S_m, v_m, g2, g3)
    else:
        do = (2 * j + 1) < N
        S2p, v2p, S2m, v2m = both(S_p, v_p, S_m, v_m, g2, g3)
        S_p = jnp.where(do, S2p, S_p)
        v_p = jnp.where(do, v2p, v_p)
        S_m = jnp.where(do, S2m, S_m)
        v_m = jnp.where(do, v2m, v_m)
    return S_p, v_p, S_m, v_m


def fe_moments_antithetic_scan(params_vec, N: int, path_idx, epoch, k0, k1,
                               rng: str = "philox"):
    """Antithetic-variates estimator (variance reduction — a capability
    the CUDA reference lacks).  Each lane simulates a +/- pair driven
    by (G, -G) from one stream; the sample is the pair mean
    Y = (X+ + X-)/2, so the returned (E[Y], E[Y^2]) feed the standard
    CI formulas with n = number of pairs (one pair uses the randomness
    of one plain path)."""
    T, S_0, v_0, r, k, rho, theta, sigma = (params_vec[i] for i in range(8))
    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    path_lo = path_idx.astype(jnp.uint32)
    path_hi = jnp.zeros_like(path_lo)
    ep = jnp.asarray(epoch, dtype=jnp.uint32)
    ones = jnp.full(path_idx.shape, 1.0, jnp.float32)
    n_blocks = (N + 1) // 2

    def body(j, carry):
        S_p, v_p, S_m, v_m = carry
        return fe_antithetic_pair_body(
            j, S_p, v_p, S_m, v_m, path_lo, path_hi, ep, k0, k1,
            r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt, N, rng=rng)

    S_p, _, S_m, _ = lax.fori_loop(
        0, n_blocks, body, (ones * S_0, ones * v_0, ones * S_0, ones * v_0))
    K = params_vec[1]
    y = np.float32(0.5) * (jnp.maximum(S_p - K, 0.0)
                           + jnp.maximum(S_m - K, 0.0))
    n = jnp.float32(y.size)
    return jnp.sum(y) / n, jnp.sum(y * y) / n
