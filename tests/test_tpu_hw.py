"""Hardware (real Mosaic lowering) regression suite — opt-in.

Run on a machine with a TPU attached:

    NMCH_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

The ordinary suite runs every Pallas kernel with ``interpret=True`` on
CPU, which exercises the kernel *logic* but not Mosaic's lowering —
the layout/carry class of bugs documented in CLAUDE.md ("Mosaic: no
bool vector while-carries; splat-initialized carries get replicated
layouts...") only appears on real hardware.  This suite asserts the
golden==kernel contract (scan engine and Pallas kernel consume
bitwise-identical counter-rng draws, so moments agree to f32
accumulation tolerance) with the actual compiled kernels.

Notes for operators (CLAUDE.md "Environment gotchas"):
- first compile of a counter-rng kernel at a new (N, n_paths) shape
  takes ~80-200 s; the remote compile server caches across processes,
  so a re-run is seconds.  Budget ~10 min for a cold first run.
- run solo (one TPU job at a time on the tunneled chip).
"""

import os

import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

if os.environ.get("NMCH_TPU_TESTS") != "1":
    pytest.skip("set NMCH_TPU_TESTS=1 (with a real TPU) to run",
                allow_module_level=True)

from nmch_tpu.params import HestonParams, SimConfig  # noqa: E402
from nmch_tpu.methods.fe import NMCH_FE  # noqa: E402
from nmch_tpu.rng.philox import split_seed  # noqa: E402
from nmch_tpu.ops.fe import fe_moments_scan, path_index_grid  # noqa: E402
from nmch_tpu.ops.fe_pallas import fe_moments_pallas  # noqa: E402
from nmch_tpu.ops.em import em_moments_scan  # noqa: E402
from nmch_tpu.ops.em_pallas import em_moments_pallas  # noqa: E402

P = HestonParams()
K0, K1 = split_seed(1234)
SW = jnp.stack([jnp.uint32(K0), jnp.uint32(K1)])


def _require_tpu():
    from nmch_tpu.utils.backend import on_tpu
    if not on_tpu():
        pytest.skip("no TPU backend attached")


# two shapes: one square-ish, one tall-N (different Mosaic tilings)
SHAPES = [(64, 8192), (256, 2048)]


@pytest.mark.parametrize("rng", ["philox", "threefry4"])
@pytest.mark.parametrize("N,n_paths", SHAPES)
def test_fe_golden_equals_kernel_on_hw(rng, N, n_paths):
    _require_tpu()
    m_s, m2_s = jax.jit(fe_moments_scan, static_argnums=(1, 6))(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(3),
        K0, K1, rng)
    m_p, m2_p = fe_moments_pallas(
        P.as_array(), SW, jnp.uint32(3), jnp.uint32(0), N=N,
        n_paths=n_paths, rng=rng, interpret=False)
    assert float(m_p) == pytest.approx(float(m_s), rel=1e-6)
    assert float(m2_p) == pytest.approx(float(m2_s), rel=1e-6)


def test_fe_rot4_golden_equals_kernel_on_hw():
    _require_tpu()
    from nmch_tpu.ops.fe import fe_moments_rot_scan
    N, n_paths = 64, 4096
    m_s, m2_s = jax.jit(fe_moments_rot_scan, static_argnums=(1, 6, 7))(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(1),
        K0, K1, "philox", 4)
    m_p, m2_p = fe_moments_pallas(
        P.as_array(), SW, jnp.uint32(1), jnp.uint32(0), N=N,
        n_paths=n_paths, rng="philox", rot=4, interpret=False)
    assert float(m_p) == pytest.approx(float(m_s), rel=1e-6)
    assert float(m2_p) == pytest.approx(float(m2_s), rel=1e-6)


def test_fe_rot8_golden_equals_kernel_on_hw():
    """Round-4 radius-antithetic rot=8: the shared
    radius_antithetic_scale (exp/log/where ladder — the branch that
    replaced expm1, which Mosaic cannot lower) must agree bitwise-
    driven between scan and the compiled kernel."""
    _require_tpu()
    from nmch_tpu.ops.fe import fe_moments_rot_scan
    N, n_paths = 64, 4096
    m_s, m2_s = jax.jit(fe_moments_rot_scan, static_argnums=(1, 6, 7))(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(1),
        K0, K1, "philox", 8)
    m_p, m2_p = fe_moments_pallas(
        P.as_array(), SW, jnp.uint32(1), jnp.uint32(0), N=N,
        n_paths=n_paths, rng="philox", rot=8, interpret=False)
    assert float(m_p) == pytest.approx(float(m_s), rel=1e-6)
    assert float(m2_p) == pytest.approx(float(m2_s), rel=1e-6)


def test_fe_kernel_deterministic_across_runs_on_hw():
    """Sequential-grid Kahan accumulation: bitwise-stable re-runs."""
    _require_tpu()
    N, n_paths = 64, 8192
    outs = [fe_moments_pallas(P.as_array(), SW, jnp.uint32(5),
                              jnp.uint32(0), N=N, n_paths=n_paths,
                              rng="philox", interpret=False)
            for _ in range(2)]
    (a, a2), (b, b2) = (jax.device_get(o) for o in outs)
    assert float(a) == float(b) and float(a2) == float(b2)


@pytest.mark.parametrize("conditional", [False, True])
def test_em_golden_equals_kernel_on_hw(conditional):
    _require_tpu()
    N, n_paths = 32, 4096
    m_s, m2_s = jax.jit(em_moments_scan, static_argnums=(1, 6, 7))(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(2),
        K0, K1, "threefry4", conditional)
    m_p, m2_p = em_moments_pallas(
        P.as_array(), SW, jnp.uint32(2), jnp.uint32(0), N=N,
        n_paths=n_paths, rng="threefry4", conditional=conditional,
        interpret=False)
    assert float(m_p) == pytest.approx(float(m_s), rel=1e-6)
    assert float(m2_p) == pytest.approx(float(m2_s), rel=1e-6)


def test_hw_prng_rot4_prices_sanely_on_hw():
    """rng='tpu' (hardware PRNG) has no golden twin by design; assert
    the statistical contract: price within CI of the oracle and
    distinct across epochs."""
    _require_tpu()
    from nmch_tpu.oracle import heston_call_undiscounted
    from nmch_tpu.results import SimResult
    N, n_paths = 64, 8192
    outs = [fe_moments_pallas(P.as_array(), SW, jnp.uint32(e),
                              jnp.uint32(0), N=N, n_paths=n_paths,
                              rng="tpu", rot=4, box="hc16f",
                              fast_sqrt=True, interpret=False)
            for e in (0, 1)]
    (m0, m20), (m1, _) = (jax.device_get(o) for o in outs)
    res = SimResult(float(m0), float(m20), 4 * n_paths)
    oracle = heston_call_undiscounted(P)
    # FE at N=64 carries O(dt) bias; allow CI + discretization margin
    assert abs(res.price - oracle) < 5 * res.ci_error + 2e-3
    assert float(m0) != float(m1)


def test_hw_prng_rot8_prices_sanely_on_hw():
    """rot=8 on the hardware-PRNG path exercises the with_scale
    normal construction (radius-antithetic scale from the radius
    uniform, rng/normal.py::_halfcircle_pair) under real Mosaic
    lowering."""
    _require_tpu()
    from nmch_tpu.oracle import heston_call_undiscounted
    from nmch_tpu.results import SimResult
    N, n_paths = 64, 8192
    m0, m20 = jax.device_get(fe_moments_pallas(
        P.as_array(), SW, jnp.uint32(3), jnp.uint32(0), N=N,
        n_paths=n_paths, rng="tpu", rot=8, box="hc16f",
        fast_sqrt=True, interpret=False))
    res = SimResult(float(m0), float(m20), 8 * n_paths)
    oracle = heston_call_undiscounted(P)
    assert abs(res.price - oracle) < 5 * res.ci_error + 2e-3


def test_mrg32k3a_bitexact_on_hw():
    """The u32 modular ladder (16-bit-partial mulhilo + 2^32-c folds)
    must match the big-int oracle on real XLA:TPU integer ops, not
    just on CPU."""
    _require_tpu()
    import numpy as np
    from nmch_tpu.rng.mrg32k3a import (
        M1, M2, A12, A13N, A21, A23N, seed_state, mrg_state_at, mrg_step,
    )
    from nmch_tpu.ops.fe import path_index_grid
    pidx = path_index_grid(128)
    s1, s2 = mrg_state_at(77, pidx, jnp.uint32(0))
    zs = []
    for _ in range(6):
        z, s1, s2 = mrg_step(s1, s2)
        zs.append(int(np.asarray(z)[0, 0]))
    o1, o2 = seed_state(77)
    for i in range(6):
        x1 = (A12 * o1[1] - A13N * o1[0]) % M1
        o1 = (o1[1], o1[2], x1)
        x2 = (A21 * o2[2] - A23N * o2[0]) % M2
        o2 = (o2[1], o2[2], x2)
        assert zs[i] == (x1 - x2) % M1, i


def test_greeks_grad_on_hw():
    """jax.grad through the N-step scan compiles and prices on chip;
    ATM-homogeneity identity dP/dS_0 == P pins correctness."""
    _require_tpu()
    from nmch_tpu.ops.greeks import fe_price_and_greeks, PARAM_NAMES
    price, g = fe_price_and_greeks(P.as_array(), jnp.uint32(0), K0, K1,
                                   N=64, n_paths=8192)
    vals = jax.device_get((price, g))
    assert float(vals[1]["S_0"]) == pytest.approx(float(vals[0]),
                                                  rel=1e-4)
    for k in PARAM_NAMES:
        assert abs(float(vals[1][k])) < 10.0, k


def test_fe_sweep_kernel_on_hw():
    """Batched points-in-lanes sweep kernel vs its scan oracle under
    real lowering (incl. the Kahan row-compensation stores)."""
    _require_tpu()
    from nmch_tpu.ops.sweep_pallas import fe_sweep_pallas, fe_sweep_scan
    pm = jnp.stack([P.as_array(),
                    HestonParams(k=2.0, sigma=0.5, theta=0.2).as_array(),
                    HestonParams(k=0.3, sigma=0.2, theta=0.05).as_array()])
    mp, m2p = fe_sweep_pallas(pm, SW, jnp.uint32(0), N=32, n_paths=1024,
                              n_points=3, rng="philox", interpret=False)
    ms, m2s = fe_sweep_scan(pm, 1234, 0, N=32, n_paths=1024)
    for i in range(3):
        assert float(mp[i]) == pytest.approx(float(ms[i]), rel=1e-6), i
        assert float(m2p[i]) == pytest.approx(float(m2s[i]), rel=1e-6), i


def test_em_sweep_kernel_on_hw():
    _require_tpu()
    from nmch_tpu.ops.sweep_pallas import em_sweep_pallas, em_sweep_scan
    pm = jnp.stack([P.as_array(),
                    HestonParams(k=2.0, sigma=0.5, theta=0.2).as_array()])
    mp, _ = em_sweep_pallas(pm, SW, jnp.uint32(0), N=16, n_paths=512,
                            n_points=2, rng="threefry4", conditional=True,
                            interpret=False)
    ms, _ = em_sweep_scan(pm, 1234, 0, N=16, n_paths=512,
                          rng="threefry4", conditional=True)
    for i in range(2):
        assert float(mp[i]) == pytest.approx(float(ms[i]), rel=1e-6), i


@pytest.mark.parametrize("srng", ["xorwow", "mrg32k3a"])
def test_fe_stateful_kernel_bitwise_on_hw(srng):
    """Round 5: the fused stateful fast engine under real Mosaic
    lowering.  Bitwise contract at the *integer* level: init states
    and post-run write-back == exact dense jump (the checkpoint-resume
    property).  Moments are held to the hw suite's rel=1e-6 bar, not
    strict equality: golden engines reduce with an XLA tree sum while
    the kernel uses the sequential-grid Kahan sum, and the two
    rounding orders can land 1 f32 ulp apart (measured round 5: mrg at
    8192x64 differs in m by exactly 1 ulp with m2 and every draw
    bitwise-identical — probe: init states and single-step outputs
    match bitwise in-kernel vs XLA on hardware)."""
    _require_tpu()
    import numpy as np
    from nmch_tpu.ops.fe_stateful_pallas import (
        fe_stateful_state, fe_moments_stateful_pallas, advance_state,
        draws_per_compute)
    n_paths, N, seed = 8192, 64, 99
    st0 = fe_stateful_state(srng, seed, n_paths, 0)
    m_k, m2_k, st1 = fe_moments_stateful_pallas(
        P.as_array(), st0, N=N, n_paths=n_paths, rng=srng)
    if srng == "xorwow":
        from nmch_tpu.ops.fe_xorwow import fe_moments_xorwow as golden
    else:
        from nmch_tpu.ops.fe_mrg import fe_moments_mrg as golden
    m_g, m2_g = jax.jit(golden, static_argnums=(1, 4))(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(0), seed)
    vals = jax.device_get((m_k, m2_k, m_g, m2_g))
    assert float(vals[0]) == pytest.approx(float(vals[2]), rel=1e-6)
    assert float(vals[1]) == pytest.approx(float(vals[3]), rel=1e-6)
    st_jump = advance_state(srng, st0, draws_per_compute(N))
    a, b = jax.device_get((st1, st_jump))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_em_xorwow_prices_sanely_on_hw():
    """Round 5: EM x the stateful default family on hardware (the
    reference's exploration.cu:54-55 configuration class)."""
    _require_tpu()
    n_paths, N = 2048, 16
    fn = jax.jit(em_moments_scan, static_argnums=(1, 6, 7, 8, 9))
    m, m2 = jax.device_get(fn(
        P.as_array(), N, path_index_grid(n_paths), jnp.uint32(0),
        jnp.uint32(K0), jnp.uint32(K1), "xorwow", False, None, 7))
    from nmch_tpu.oracle import heston_call_undiscounted
    from nmch_tpu.results import SimResult
    res = SimResult(float(m), float(m2), n_paths)
    assert abs(res.price - heston_call_undiscounted(P)) < 4 * res.ci_error


@pytest.mark.parametrize("srng", ["xorwow", "mrg32k3a"])
def test_fe_stateful_method_epoch_parity_on_hw(srng):
    """Round 5 (review fix): the method-level stream contract on real
    Mosaic — scan == pallas at epochs 0-2, exercising the carried-
    state boundary jump (advance_state by 2^EPOCH_LOG2 - D) between
    computes.  Same (N, n_paths) shape as the kernel bitwise test, so
    the kernel compile is cache-warm; moments at the suite's rel=1e-6
    bar (tree sum vs Kahan sum, module docstring)."""
    _require_tpu()
    cfg = SimConfig(NTPB=512, NB=16, N=64, seed=99)   # 8192 paths
    mp = NMCH_FE(cfg, P, engine="pallas", rng=srng)
    mp.init(99)
    ms = NMCH_FE(cfg, P, engine="scan", rng=srng)
    ms.init(99)
    for _ in range(3):
        assert mp.compute().price == pytest.approx(
            ms.compute().price, rel=1e-6)


@pytest.mark.parametrize("conditional", [False, True])
def test_em_bench_config_prices_sanely_on_hw(conditional):
    """bench.py's EM section shapes (2^18 paths x N=10^3 — the
    reference's 512x512 grid config, execution_time_comparison.png):
    pins the exact (N, n_paths, rng, poisson_cut) the driver times and
    keeps its Mosaic compile warm in the cross-process cache (a cold
    EM compile is minutes; the bench watchdog budget assumes warm).
    Statistical contract only — the golden==kernel bitwise check runs
    at the small shape above."""
    _require_tpu()
    from nmch_tpu.oracle import heston_call_undiscounted
    from nmch_tpu.results import SimResult
    from nmch_tpu.ops.em import FAST_POISSON_CUT
    N, n_paths = 1000, 1 << 18
    m, m2 = jax.device_get(em_moments_pallas(
        P.as_array(), SW, jnp.uint32(0), jnp.uint32(0), N=N,
        n_paths=n_paths, rng="threefry4", conditional=conditional,
        poisson_cut=FAST_POISSON_CUT, interpret=False))
    res = SimResult(float(m), float(m2), n_paths)
    # exact scheme: no discretization bias term needed
    assert abs(res.price - heston_call_undiscounted(P)) < 4 * res.ci_error
