"""Probe: full-VMEM fusion of the QMC bridge matmul into the path
simulator (ROADMAP item 3, VERDICT r4 next-step 8 — "probe, close
with data either way").

The production QMC pipeline (ops/fe_qmc.py::fe_moments_qmc) runs
three device stages with HBM temporaries between them:

    Sobol' + ndtri  ->  z (N, M) HBM  ->  A @ z matmul  ->
    dW (N, M) HBM  ->  fused Pallas simulator

At 2^19 points x N=1000 the dW round-trip alone is ~4.2 GB of HBM
traffic (~10 ms at v5e stream rate) and the serialized
matmul-then-simulate schedule cannot overlap MXU and VPU work.  The
fused kernel here consumes the NORMALS z directly: per point tile the
(N, 8, 128) z slabs are DMA'd ONCE into VMEM scratch (manual copy —
the automatic pipeliner would double-buffer the 8.2 MB pair across
point-tile transitions and bust the ~16 MB VMEM budget), and each
time-chunk's increments are produced in-kernel by an MXU dot against
the sqrt_dt-scaled bridge response matrix A (ops/fe_qmc.py::
bb_increment_matrix) immediately before the VPU simulation consumes
them — no dW ever touches HBM, and the hardware can overlap chunk
c's MXU pass with chunk c-1's VPU steps.

Run: ``python benchmarks/qmc_fused_probe.py [--n 524288 --N 1000]``
(real TPU; measures production vs fused and cross-checks the
per-replicate payoff sums).

VERDICT (measured, RESULTS.md round 5): CLOSED NEGATIVE.  At
f32-grade increment precision the fusion runs 0.71-0.72x production
(141-143 vs 102 ms) — Mosaic's in-kernel dot offers only DEFAULT /
HIGHEST, the hand-built 3-pass bf16 hi/lo split costs as much as
HIGHEST because the per-cell 125-row matmuls run far below the one
big XLA matmul's MXU utilization, and the ~11 ms of observed MXU/VPU
overlap cannot cover that.  The only faster variant (DEFAULT 1-pass
bf16, 1.17x) injects a ~5e-5 common-mode price bias, ~4x the
2^20-point RQMC CI — rejected by the same precision ladder that set
Precision.HIGH in production.  The 3-stage pipeline stays.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(pv_ref, a_ref, z1_hbm, z2_hbm, sum_ref, sumsq_ref,
                  z1_ref, z2_ref, dw1_ref, dw2_ref, S_ref, v_ref,
                  sem1, sem2, *,
                  n_chunk: int, n_chunks: int, tiles_per_rep: int,
                  N: int, precision=jax.lax.Precision.HIGHEST):
    """Grid (point_tiles, time_chunks), time innermost.

    a_ref: (1, n_chunk, N) rows of sqrt_dt * A for this time chunk
    (auto-pipelined — 0.5 MB blocks; 3D pre-chunked layout because
    Mosaic block shapes must tile (8, 128) or equal the trailing
    array dims).  z*_hbm: full (N, mt*8, 128)
    normal arrays left in HBM; the (N, 8, 128) point-tile slab is
    copied into VMEM scratch once at c == 0 and stays resident for
    all time chunks (the bridge is dense: every chunk of dW needs
    every row of z).
    """
    p = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        pltpu.make_async_copy(
            z1_hbm.at[:, pl.ds(p * 8, 8), :], z1_ref, sem1).start()
        pltpu.make_async_copy(
            z2_hbm.at[:, pl.ds(p * 8, 8), :], z2_ref, sem2).start()
        pltpu.make_async_copy(
            z1_hbm.at[:, pl.ds(p * 8, 8), :], z1_ref, sem1).wait()
        pltpu.make_async_copy(
            z2_hbm.at[:, pl.ds(p * 8, 8), :], z2_ref, sem2).wait()
        S_ref[...] = jnp.full((8, 128), 1.0, jnp.float32) * pv_ref[1]
        v_ref[...] = jnp.full((8, 128), 1.0, jnp.float32) * pv_ref[2]

    from nmch_tpu.ops.fe import fe_consts, fe_step

    T = pv_ref[0]
    S_0 = pv_ref[1]
    r = pv_ref[3]
    k = pv_ref[4]
    rho = pv_ref[5]
    theta = pv_ref[6]
    sigma = pv_ref[7]
    N_ = jnp.float32(n_chunk * n_chunks)
    dt = T / N_
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    # sqrt_dt folded into A outside -> fe_step consumes raw dW
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt,
                    jnp.float32(1.0))

    # in-kernel bridge: this chunk's increments from the resident z
    z1 = z1_ref[...].reshape(N, 8 * 128)
    z2 = z2_ref[...].reshape(N, 8 * 128)
    dw1_ref[...] = jax.lax.dot_general(
        a_ref[0], z1, (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).reshape(n_chunk, 8, 128)
    dw2_ref[...] = jax.lax.dot_general(
        a_ref[0], z2, (((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).reshape(n_chunk, 8, 128)

    def body(i, carry):
        S, v = carry
        return fe_step(S, v, dw1_ref[i], dw2_ref[i], cst)

    S, v = lax.fori_loop(0, n_chunk, body, (S_ref[...], v_ref[...]))
    S_ref[...] = S
    v_ref[...] = v

    @pl.when(jnp.logical_and(p == 0, c == 0))
    def _():
        for rr in range(sum_ref.shape[0]):
            sum_ref[rr, 0] = 0.0
            sumsq_ref[rr, 0] = 0.0

    @pl.when(c == n_chunks - 1)
    def _():
        payoff = jnp.maximum(S - S_0, 0.0)
        rep = p // tiles_per_rep
        sum_ref[rep, 0] += jnp.sum(payoff)
        sumsq_ref[rep, 0] += jnp.sum(payoff * payoff)


def qmc_payoff_sums_fused(params_vec, z1, z2, A_scaled, n_shifts: int,
                          *, interpret: bool = False,
                          precision=jax.lax.Precision.HIGHEST):
    """Per-replicate (sum payoff, sum payoff^2) with the bridge matmul
    fused into the simulator; z*: (N, M) bridge-ordered unit normals
    (fe_qmc.qmc_normals_mxu), A_scaled = sqrt_dt * bb_increment_matrix."""
    from nmch_tpu.ops.fe_qmc import _pick_time_chunk

    N, M = z1.shape
    if M % (1024 * n_shifts):
        raise ValueError(f"M={M} must be a multiple of 1024*n_shifts")
    mt = M // 1024
    nc = _pick_time_chunk(N)
    zz1 = z1.reshape(N, mt * 8, 128)
    zz2 = z2.reshape(N, mt * 8, 128)
    kern = functools.partial(_fused_kernel, n_chunk=nc,
                             n_chunks=N // nc,
                             tiles_per_rep=mt // n_shifts, N=N,
                             precision=precision)
    s, s2 = pl.pallas_call(
        kern,
        grid=(mt, N // nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, N), lambda p, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_shifts, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_shifts, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, 8, 128), jnp.float32),
            pltpu.VMEM((N, 8, 128), jnp.float32),
            pltpu.VMEM((nc, 8, 128), jnp.float32),
            pltpu.VMEM((nc, 8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params_vec.astype(jnp.float32),
      A_scaled.reshape(N // nc, nc, N), zz1, zz2)
    return s[:, 0], s2[:, 0]


def timed(fn, reps=3):
    out = fn()
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.device_get([jax.tree.leaves(o)[0] for o in outs])
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--n-shifts", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode correctness check only")
    ap.add_argument("--precision", type=str, default="HIGHEST")
    ap.add_argument("--hilo", action="store_true",
                    help="3-pass bf16 hi/lo fused kernel (f32-grade)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nmch_tpu.ops import fe_qmc
    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed

    params = HestonParams().as_array()
    T = HestonParams().T
    k0, k1 = split_seed(1234)
    n = args.n // args.n_shifts
    N = args.N
    R = args.n_shifts

    A = np.asarray(fe_qmc.bb_increment_matrix(N))
    sqrt_dt = np.sqrt(T / N).astype(np.float32)

    @jax.jit
    def prod(ep):
        dW1, dW2 = fe_qmc.qmc_increments_mxu(N, n, ep, k0, k1,
                                             jnp.float32(T), n_shifts=R)
        return fe_qmc.qmc_payoff_sums_pallas(params, dW1, dW2, R,
                                             interpret=args.cpu)

    @jax.jit
    def fused(ep):
        z1, z2 = fe_qmc.qmc_normals_mxu(N, n, ep, k0, k1, n_shifts=R)
        if args.hilo:
            return qmc_payoff_sums_fused_hilo(
                params, z1, z2, jnp.asarray(sqrt_dt * A), R,
                interpret=args.cpu)
        return qmc_payoff_sums_fused(
            params, z1, z2, jnp.asarray(sqrt_dt * A), R,
            interpret=args.cpu,
            precision=getattr(jax.lax.Precision, args.precision))

    ep = jnp.uint32(3)
    sp, sp2 = jax.device_get(prod(ep))
    sf, sf2 = jax.device_get(fused(ep))
    rel = np.max(np.abs(sf - sp) / np.maximum(np.abs(sp), 1e-30))
    print(f"replicate sums prod vs fused: max rel diff {rel:.3e}")
    print("  prod :", np.array2string(sp, precision=2))
    print("  fused:", np.array2string(sf, precision=2))
    # HIGH-precision matmul in two different schedules: agreement to
    # ~1e-5 rel on ~1e5-path sums means identical Brownian law
    ok = rel < 5e-4
    print("AGREE" if ok else "MISMATCH")
    if args.cpu:
        return 0 if ok else 1

    t_p = timed(lambda: prod(ep))
    t_f = timed(lambda: fused(ep))
    g_p = args.n * N / t_p / 1e9
    g_f = args.n * N / t_f / 1e9
    print(f"production (3-stage): {t_p*1e3:7.1f} ms  {g_p:6.2f} G")
    print(f"fused (z -> kernel):  {t_f*1e3:7.1f} ms  {g_f:6.2f} G")
    print(f"speedup: {t_p/t_f:.3f}x")
    return 0 if ok else 1


def _fused_kernel_hilo(pv_ref, ahi_ref, alo_ref, z1h_hbm, z1l_hbm,
                       z2h_hbm, z2l_hbm, sum_ref, sumsq_ref,
                       z1h_ref, z1l_ref, z2h_ref, z2l_ref,
                       dw1_ref, dw2_ref, S_ref, v_ref, sem, *,
                       n_chunk: int, n_chunks: int, tiles_per_rep: int,
                       N: int):
    """3-pass bf16 hi/lo variant: dW = Ahi@zhi + Ahi@zlo + Alo@zhi —
    the same error-compensated split XLA's Precision.HIGH uses (the
    dropped Alo@zlo term is ~2^-16 relative), hand-built because
    Mosaic's dot lowering supports only DEFAULT and HIGHEST.  The z
    residency halves to 4.1 MB (bf16 pairs) vs the f32 kernel."""
    p = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        for hbm, ref in ((z1h_hbm, z1h_ref), (z1l_hbm, z1l_ref),
                         (z2h_hbm, z2h_ref), (z2l_hbm, z2l_ref)):
            cp = pltpu.make_async_copy(
                hbm.at[:, pl.ds(p * 8, 8), :], ref, sem)
            cp.start()
            cp.wait()
        S_ref[...] = jnp.full((8, 128), 1.0, jnp.float32) * pv_ref[1]
        v_ref[...] = jnp.full((8, 128), 1.0, jnp.float32) * pv_ref[2]

    from nmch_tpu.ops.fe import fe_consts, fe_step

    T = pv_ref[0]
    S_0 = pv_ref[1]
    r = pv_ref[3]
    k = pv_ref[4]
    rho = pv_ref[5]
    theta = pv_ref[6]
    sigma = pv_ref[7]
    N_ = jnp.float32(n_chunk * n_chunks)
    dt = T / N_
    sqrt_rho_c = jnp.sqrt(jnp.float32(1.0) - rho * rho)
    cst = fe_consts(r, k, theta, sigma, rho, sqrt_rho_c, dt,
                    jnp.float32(1.0))

    def dot3(ah, al, zh, zl):
        dn = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(
            ah, zh, dn, preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(
            ah, zl, dn, preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(
            al, zh, dn, preferred_element_type=jnp.float32)
        return out

    ah = ahi_ref[0]
    al = alo_ref[0]
    dw1_ref[...] = dot3(
        ah, al, z1h_ref[...].reshape(N, 1024),
        z1l_ref[...].reshape(N, 1024)).reshape(n_chunk, 8, 128)
    dw2_ref[...] = dot3(
        ah, al, z2h_ref[...].reshape(N, 1024),
        z2l_ref[...].reshape(N, 1024)).reshape(n_chunk, 8, 128)

    def body(i, carry):
        S, v = carry
        return fe_step(S, v, dw1_ref[i], dw2_ref[i], cst)

    S, v = lax.fori_loop(0, n_chunk, body, (S_ref[...], v_ref[...]))
    S_ref[...] = S
    v_ref[...] = v

    @pl.when(jnp.logical_and(p == 0, c == 0))
    def _():
        for rr in range(sum_ref.shape[0]):
            sum_ref[rr, 0] = 0.0
            sumsq_ref[rr, 0] = 0.0

    @pl.when(c == n_chunks - 1)
    def _():
        payoff = jnp.maximum(S - S_0, 0.0)
        rep = p // tiles_per_rep
        sum_ref[rep, 0] += jnp.sum(payoff)
        sumsq_ref[rep, 0] += jnp.sum(payoff * payoff)


def _hilo_split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def qmc_payoff_sums_fused_hilo(params_vec, z1, z2, A_scaled,
                               n_shifts: int, *,
                               interpret: bool = False):
    """3-pass bf16 hi/lo fused bridge+simulator (see kernel above)."""
    from nmch_tpu.ops.fe_qmc import _pick_time_chunk

    N, M = z1.shape
    if M % (1024 * n_shifts):
        raise ValueError(f"M={M} must be a multiple of 1024*n_shifts")
    mt = M // 1024
    nc = _pick_time_chunk(N)
    z1h, z1l = _hilo_split(z1)
    z2h, z2l = _hilo_split(z2)
    ah, al = _hilo_split(A_scaled)
    kern = functools.partial(_fused_kernel_hilo, n_chunk=nc,
                             n_chunks=N // nc,
                             tiles_per_rep=mt // n_shifts, N=N)
    s, s2 = pl.pallas_call(
        kern,
        grid=(mt, N // nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, N), lambda p, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, N), lambda p, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_shifts, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_shifts, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, 8, 128), jnp.bfloat16),
            pltpu.VMEM((N, 8, 128), jnp.bfloat16),
            pltpu.VMEM((N, 8, 128), jnp.bfloat16),
            pltpu.VMEM((N, 8, 128), jnp.bfloat16),
            pltpu.VMEM((nc, 8, 128), jnp.float32),
            pltpu.VMEM((nc, 8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params_vec.astype(jnp.float32),
      ah.reshape(N // nc, nc, N), al.reshape(N // nc, nc, N),
      z1h.reshape(N, mt * 8, 128), z1l.reshape(N, mt * 8, 128),
      z2h.reshape(N, mt * 8, 128), z2l.reshape(N, mt * 8, 128))
    return s[:, 0], s2[:, 0]


if __name__ == "__main__":
    raise SystemExit(main())
