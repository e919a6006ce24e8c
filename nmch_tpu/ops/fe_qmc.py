"""Quasi-Monte Carlo FE engine: scrambled Sobol' + Brownian bridge.

The rebuild-mandate capability beyond the CUDA reference's plain MC
(SURVEY §7 / round-1 roadmap #3): integration error ~ n^-0.8 instead
of n^-0.5, so error-matched throughput grows with accuracy targets
(measured table in benchmarks/RESULTS.md).

Design (TPU-first, pure XLA — no Pallas needed, the work is a handful
of large fused elementwise passes plus one scan):

1. **Dimension ordering / Brownian bridge.**  A Euler path consumes
   2N normals.  Plain time ordering spreads the payoff's variance over
   all of them, which defeats QMC in high dimension; the Brownian
   bridge re-orders so dimension 0 is the *terminal* value W_T,
   dimension 1 the midpoint, etc. (variance halves each level), giving
   a low effective dimension.  ``bb_plan`` precomputes the bridge as
   numpy level arrays: per node (m, a, b): W_m = wl*W_a + wr*W_b +
   sig*sqrt(dt)*z.  The two Brownian factors interleave Sobol'
   dimensions (factor f, bridge node k -> dim 2k+f).
2. **Point set.**  rng/sobol.py: Joe–Kuo direction numbers, one
   30-XOR pass per bridge level generates ALL that level's dimensions
   at once; per-dimension digital shifts keyed by (seed, epoch) make
   the estimator unbiased (randomized QMC).
3. **Normals.** inverse CDF (jax.scipy ndtri, f32 accuracy ~5e-7) —
   Box–Muller would entangle dimension pairs and break the
   low-discrepancy structure.
4. **Simulation.**  The increments matrix (N, 2, n) feeds the exact
   same ``fe_step`` as the other engines through one ``lax.scan``.
5. **CI.**  ``n_shifts`` independent digital shifts of n/n_shifts
   points each; the estimate is the shift mean and the CI comes from
   the shift-to-shift spread (the only valid error estimate for QMC —
   within-point-set variance is meaningless for correlated points).
   The returned (m, m2) are synthesized so SimResult(m, m2, n_paths)
   reproduces exactly that CI through the standard formula.

Reference contrast: ``NMCH_FE.cu`` draws curand_normal4 time-ordered;
there is no QMC anywhere in the reference.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import ndtri

from ..rng.sobol import (
    direction_numbers, gray_codes, sobol_dims_u32, digital_shifts,
    lms_scramble_directions, u01_from_words,
)
from .fe import fe_consts, fe_step


@functools.lru_cache(maxsize=8)
def bb_plan(N: int):
    """Brownian-bridge construction plan for N steps (host, cached).

    Returns a list of levels; each level is a dict of numpy arrays
    {m, a, b, wl, wr, sig, dims} where ``dims`` are the bridge-node
    indices (Sobol' dimension = 2*node + factor) and ``sig`` is in
    units of sqrt(dt).  Level 0 is the terminal node (special-cased:
    W_N = sig * z with sig = sqrt(N)).
    """
    levels = [dict(m=np.array([N]), a=np.array([0]), b=np.array([0]),
                   wl=np.array([[0.0]], np.float32),
                   wr=np.array([[0.0]], np.float32),
                   sig=np.array([[np.sqrt(N)]], np.float32),
                   dims=np.array([0]))]
    k = 1
    segs = [(0, N)]
    while segs:
        nxt, m_, a_, b_, wl_, wr_, sg_, dm_ = [], [], [], [], [], [], [], []
        for a, b in segs:
            if b - a <= 1:
                continue
            m = (a + b) // 2
            m_.append(m); a_.append(a); b_.append(b)
            wl_.append((b - m) / (b - a))
            wr_.append((m - a) / (b - a))
            sg_.append(np.sqrt((m - a) * (b - m) / (b - a)))
            dm_.append(k)
            k += 1
            nxt += [(a, m), (m, b)]
        if m_:
            levels.append(dict(m=np.array(m_), a=np.array(a_),
                               b=np.array(b_),
                               wl=np.array(wl_, np.float32)[:, None],
                               wr=np.array(wr_, np.float32)[:, None],
                               sig=np.array(sg_, np.float32)[:, None],
                               dims=np.array(dm_)))
        segs = nxt
    assert k == N, (k, N)
    return levels


@functools.lru_cache(maxsize=8)
def bb_increment_matrix(N: int):
    """(N, N) float32 A with dW = sqrt(dt) * (A @ z): the Brownian
    bridge is a LINEAR map from bridge-ordered unit normals z to the
    time-ordered increments, so on TPU it is one MXU matmul instead of
    ~2 log2(N) scatter/gather passes (measured 3-6x faster end-to-end;
    the scatter path remains as _bridge_factor for cross-validation —
    tests assert both give the same Brownian law).

    Built by running bb_plan's exact recursion on the identity: column
    k is the path response to z_k = 1 (a hat function between node k's
    parents), in units of sqrt(dt)."""
    W = np.zeros((N + 1, N), np.float64)
    for lev in bb_plan(N):
        for i in range(len(lev["m"])):
            m, a, b = int(lev["m"][i]), int(lev["a"][i]), int(lev["b"][i])
            k = int(lev["dims"][i])
            W[m] = lev["wl"][i] * W[a] + lev["wr"][i] * W[b]
            W[m, k] += float(lev["sig"][i].squeeze()
                             if hasattr(lev["sig"][i], "squeeze")
                             else lev["sig"][i])
    return np.ascontiguousarray((W[1:] - W[:-1]).astype(np.float32))


def _bridge_factor(levels, V, gray, shifts, sqrt_dt, n, N, factor):
    """W (N+1, n) for one Brownian factor from its Sobol' dimensions."""
    W = jnp.zeros((N + 1, n), jnp.float32)
    for lev in levels:
        dims = 2 * lev["dims"] + factor
        x = sobol_dims_u32(gray, V[dims])            # (L, n)
        x = x ^ shifts[dims][:, None]
        z = ndtri(u01_from_words(x))
        upd = (lev["wl"] * W[lev["a"]] + lev["wr"] * W[lev["b"]]
               + (lev["sig"] * sqrt_dt) * z)
        W = W.at[lev["m"]].set(upd)
    return W


def qmc_increments(N: int, n: int, epoch, k0, k1, T, v_np=None):
    """(N, n) increment matrices (dW1, dW2) via Sobol' + scatter bridge
    (the reference construction; fe_moments_qmc uses the faster MXU
    matmul form below — both produce the same Brownian law)."""
    v_np = direction_numbers(2 * N) if v_np is None else v_np
    V = jnp.asarray(v_np)
    levels = bb_plan(N)
    gray = gray_codes(n)
    shifts = digital_shifts(jnp.arange(2 * N, dtype=jnp.uint32),
                            epoch, k0, k1)
    sqrt_dt = jnp.sqrt(T / jnp.float32(N))
    dws = []
    for f in (0, 1):
        W = _bridge_factor(levels, V, gray, shifts, sqrt_dt, n, N, f)
        dws.append(W[1:] - W[:-1])
    return dws[0], dws[1]


def qmc_increments_mxu(N: int, n: int, epoch, k0, k1, T, v_np=None,
                       n_shifts: int = 1, scramble: str = "lms-shift"):
    """(N, n_shifts*n) increment matrices (dW1, dW2): Sobol' points ->
    inverse-CDF normals (bridge-ordered) -> ONE MXU matmul per factor
    (bb_increment_matrix).  All n_shifts digitally-shifted replicates
    ride the same matmul (replicate-major along the point axis;
    replicate r's shift key is epoch*n_shifts + r)."""
    v_np = direction_numbers(2 * N) if v_np is None else v_np
    V = jnp.asarray(v_np)
    if scramble == "lms-shift":
        # Owen-style linear matrix scramble, keyed by (seed, epoch);
        # the n_shifts digital-shift replicates share one scramble (the
        # shift randomization alone already unbiases each replicate, so
        # the replicate CI stays valid conditional on the scramble)
        V = lms_scramble_directions(V, epoch, k0, k1)
    elif scramble != "shift":
        raise ValueError(f"unknown scramble {scramble!r}")
    A = jnp.asarray(bb_increment_matrix(N))
    gray = jnp.tile(gray_codes(n), n_shifts)                    # (M,)
    ep0 = jnp.asarray(epoch, jnp.uint32) * np.uint32(n_shifts)
    reps = ep0 + jnp.arange(n_shifts, dtype=jnp.uint32)
    shifts = digital_shifts(
        jnp.arange(2 * N, dtype=jnp.uint32)[:, None], reps[None, :],
        k0, k1)                                                  # (2N, R)
    sqrt_dt = jnp.sqrt(T / jnp.float32(N))
    dws = []
    for f in (0, 1):
        dims = np.arange(N) * 2 + f
        x = sobol_dims_u32(gray, V[dims])                        # (N, M)
        x = x ^ jnp.repeat(shifts[dims], n, axis=1)
        z = ndtri(u01_from_words(x))
        dws.append(sqrt_dt * jnp.dot(A, z,
                                     precision=jax.lax.Precision.HIGHEST))
    return dws[0], dws[1]


def _sim_payoff(params_vec, N, dW1, dW2):
    """Per-path ATM-call payoff over paths driven by given increments.

    The increments arrive as Brownian increments (already scaled by
    sqrt(dt)); fe_step takes unit normals and multiplies by sqrt_dt,
    so we pre-divide — keeping fe_step shared verbatim with the other
    engines."""
    T, S_0, v_0, r, k, rho, theta, sigma = (params_vec[i] for i in range(8))
    dt = T / jnp.float32(N)
    sqrt_dt = jnp.sqrt(dt)
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt, sqrt_dt)
    n = dW1.shape[1]
    S0 = jnp.full((n,), 1.0, jnp.float32) * S_0
    v0 = jnp.full((n,), 1.0, jnp.float32) * v_0

    def body(carry, gs):
        S, v = carry
        g1, g2 = gs
        S, v = fe_step(S, v, g1, g2, cst)
        return (S, v), None

    (S, _), _ = lax.scan(body, (S0, v0),
                         (dW1 / sqrt_dt, dW2 / sqrt_dt))
    return jnp.maximum(S - S_0, 0.0)


@functools.partial(jax.jit, static_argnames=("N", "n_paths", "n_shifts"))
def fe_moments_qmc(params_vec, epoch, k0, k1, *, N: int, n_paths: int,
                   n_shifts: int = 8):
    """(m, m2) for the QMC engine; SimResult(m, m2, n_paths) yields the
    randomized-QMC CI (see module docstring, point 5).

    n_paths points are split into ``n_shifts`` independently-shifted
    replicates of n_paths/n_shifts Sobol' points (same index range,
    different digital shifts).
    """
    if n_shifts < 2:
        raise ValueError(f"n_shifts={n_shifts} must be >= 2: the RQMC CI "
                         f"is the spread of independent shift replicates "
                         f"(one replicate has no spread — t.ppf(., 0) is "
                         f"NaN)")
    if n_paths % n_shifts:
        raise ValueError(f"n_paths={n_paths} must be divisible by "
                         f"n_shifts={n_shifts}")
    n = n_paths // n_shifts
    v_np = direction_numbers(2 * N)
    T = params_vec[0]
    dW1, dW2 = qmc_increments_mxu(N, n, epoch, k0, k1, T, v_np=v_np,
                                  n_shifts=n_shifts)
    payoff = _sim_payoff(params_vec, N, dW1, dW2)
    means = jnp.mean(payoff.reshape(n_shifts, n), axis=1)
    m = jnp.mean(means)
    # Synthesize m2 so SimResult's 1.96*sqrt((m2-m^2)/n) formula
    # returns the honest RQMC 95% CI.  var(shift means)/(R-1) is the
    # unbiased variance of the mean; with only R replicates the 95%
    # quantile is Student-t with R-1 dof, not the normal 1.96 — the
    # (t/z)^2 factor bakes that in (t_7 = 2.365 for the default R=8).
    from scipy.stats import t as _t
    t_over_z = float(_t.ppf(0.975, n_shifts - 1)) / 1.959963984540054
    var_of_mean = jnp.var(means) * np.float32(
        t_over_z ** 2 / (n_shifts - 1))
    m2 = m * m + var_of_mean * jnp.float32(n_paths)
    return m, m2
