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
from ..rng.threefry4 import draw4_threefry4
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
    (rng/threefry.py); rng="threefry4": one fused 4-word block per
    call, the fastest reproducible generator (rng/threefry4.py)."""
    if rng == "philox":
        return lambda j: philox4x32(j, epoch, path_lo, path_hi, k0, k1)
    if rng == "threefry":
        return lambda j: draw4_threefry(j, epoch, path_lo, k0, k1)
    if rng == "threefry4":
        return lambda j: draw4_threefry4(j, epoch, path_lo, k0, k1,
                                         path_hi=path_hi)
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


_SQRT_HALF = np.float32(np.sqrt(0.5))


def rotation_images(a, b, rot: int):
    """``rot`` orthogonal images of an iid normal pair.

    rot=2: (a,b), (-a,-b) — classic antithetic variates.
    rot=4: + (b,-a), (-b,a) — quarter-turn stratification of the
           Box–Muller angle.
    rot=8: + the four quarter-turns of the 45°-rotated pair
           c=(a-b)/sqrt2, d=(a+b)/sqrt2 — eighth-turn stratification.

    Each image is an exact iid N(0,1)^2 pair (the isotropic Gaussian is
    invariant under orthogonal maps), so every rotated copy drives a
    marginally-exact Euler path.  One draw's bits amortize over rot
    simulated paths (the throughput lever) while the group mean has
    *lower* variance than iid paths of the same count (measured in
    benchmarks/RESULTS.md; asserted in tests/test_fe.py)."""
    imgs = [(a, b), (-a, -b), (b, -a), (-b, a)]
    if rot > 4:
        c = (a - b) * _SQRT_HALF
        d = (a + b) * _SQRT_HALF
        imgs += [(c, d), (-c, -d), (d, -c), (-d, c)]
    return imgs[:rot]



def fe_rot_block_body(j, Ss, vs, path_lo, path_hi, epoch, k0, k1,
                      r, k, theta, sigma, rho, sqrt_rho_c,
                      dt, sqrt_dt, N: int, rot: int, rng: str = "philox"):
    """Advance ``rot`` rotation-coupled path copies through steps
    2j and 2j+1 from one counter block (same draws as rot=1)."""
    draw = make_draw4(rng, path_lo, path_hi, epoch, k0, k1)
    bits = draw(jnp.uint32(0) + j.astype(jnp.uint32))
    g0, g1, g2, g3 = normal4_from_bits(*bits)

    def all_copies(Ss, vs, a, b):
        out_S, out_v = [], []
        for t, (ta, tb) in enumerate(rotation_images(a, b, rot)):
            S, v = fe_step(Ss[t], vs[t], ta, tb, r, k, theta, sigma,
                           rho, sqrt_rho_c, dt, sqrt_dt)
            out_S.append(S)
            out_v.append(v)
        return out_S, out_v

    Ss, vs = all_copies(Ss, vs, g0, g1)
    if N % 2 == 0:
        Ss, vs = all_copies(Ss, vs, g2, g3)
    else:
        do = (2 * j + 1) < N
        S2, v2 = all_copies(Ss, vs, g2, g3)
        Ss = [jnp.where(do, s2, s) for s2, s in zip(S2, Ss)]
        vs = [jnp.where(do, w2, w) for w2, w in zip(v2, vs)]
    return Ss, vs


def fe_moments_rot_scan(params_vec, N: int, path_idx, epoch, k0, k1,
                        rng: str = "philox", rot: int = 2):
    """Rotation-sampling estimator (variance reduction beyond the CUDA
    reference).  Each lane simulates ``rot`` orthogonally-coupled
    copies driven by rotation_images of one stream's draws; the sample is
    the group mean Y = (1/rot) sum X_t, so the returned (E[Y], E[Y^2])
    feed the standard CI formulas with n = number of groups (one group
    consumes the randomness of one plain path)."""
    if rot not in (2, 4, 8):
        raise ValueError(f"rot must be 2, 4 or 8, got {rot}")
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
        Ss, vs = list(carry[:rot]), list(carry[rot:])
        Ss, vs = fe_rot_block_body(
            j, Ss, vs, path_lo, path_hi, ep, k0, k1,
            r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt, N,
            rot=rot, rng=rng)
        return tuple(Ss) + tuple(vs)

    init = tuple(ones * S_0 for _ in range(rot)) \
        + tuple(ones * v_0 for _ in range(rot))
    out = lax.fori_loop(0, n_blocks, body, init)
    K = params_vec[1]
    y = jnp.maximum(out[0] - K, 0.0)
    for t in range(1, rot):
        y = y + jnp.maximum(out[t] - K, 0.0)
    y = y * np.float32(1.0 / rot)
    n = jnp.float32(y.size)
    return jnp.sum(y) / n, jnp.sum(y * y) / n


def fe_moments_antithetic_scan(params_vec, N: int, path_idx, epoch, k0, k1,
                               rng: str = "philox"):
    """Antithetic variates == rotation sampling with rot=2."""
    return fe_moments_rot_scan(params_vec, N, path_idx, epoch, k0, k1,
                               rng=rng, rot=2)
