"""Auxiliary subsystem tests: checkpoint/resume, JSON output, profiling
ladder, determinism (SURVEY.md §5)."""

import json

import pytest

from nmch_tpu import NMCH_FE, HestonParams, SimConfig
from nmch_tpu.cli import run as cli_run


CFG = SimConfig(NTPB=512, NB=4, N=50)


def test_checkpoint_resume_reproduces_stream(tmp_path):
    """A resumed pricer must draw exactly what the saved one would."""
    a = NMCH_FE(CFG, HestonParams(), engine="scan")
    a.init(1234)
    a.compute()                       # epoch 0 consumed
    ckpt = tmp_path / "state.json"
    a.save_state(str(ckpt))
    expected = a.compute().price      # epoch 1

    b = NMCH_FE(CFG, HestonParams(), engine="scan")
    b.load_state(str(ckpt))
    assert b.compute().price == expected


def test_checkpoint_roundtrips_params(tmp_path):
    a = NMCH_FE(CFG, HestonParams(sigma=0.42), engine="scan")
    a.init(7)
    ckpt = tmp_path / "s.json"
    a.save_state(str(ckpt))
    b = NMCH_FE(CFG, HestonParams(), engine="scan")
    b.load_state(str(ckpt))
    assert b.params.sigma == 0.42
    assert b.streams.seed == 7


def test_save_before_init_raises(tmp_path):
    m = NMCH_FE(CFG, HestonParams(), engine="scan")
    with pytest.raises(RuntimeError):
        m.save_state(str(tmp_path / "x.json"))


def test_cli_json_output(capsys):
    rc = cli_run(["--method", "fe", "--engine", "scan", "--NB", "4",
                  "--N", "20", "--json", "--oracle"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip())
    for key in ("price", "price_squared", "err", "ci_error",
                "exec_time_ms", "heston_oracle", "n_paths"):
        assert key in rec
    assert abs(rec["price"] - rec["heston_oracle"]) < 5 * rec["ci_error"] + 5e-3


def test_variant_ladder_cpu():
    from nmch_tpu.utils.profiling import variant_ladder
    rows = variant_ladder(n_paths=1024, N=10, reps=1, include_em=False,
                          interpret=True)
    # pallas-{threefry,threefry4,philox} + scan-philox + the stateful
    # fast-engine pair pallas-{xorwow,mrg32k3a} (no rng=tpu on CPU)
    assert len(rows) == 6
    assert {r["rng"] for r in rows} >= {"threefry4", "xorwow", "mrg32k3a"}
    assert all(r["ms"] > 0 for r in rows)


def test_pallas_engine_deterministic_across_runs():
    """SURVEY.md §5: the reference's float atomicAdd made results
    non-deterministic at ULP level; our reduction must be bitwise
    stable run-to-run."""
    m = NMCH_FE(CFG, HestonParams(), engine="pallas", interpret=True)
    m.init(99)
    p1 = m.compute().price
    m2 = NMCH_FE(CFG, HestonParams(), engine="pallas", interpret=True)
    m2.init(99)
    p2 = m2.compute().price
    assert p1 == p2                    # bitwise equal, not approx


def test_prewarm_compiles_tiny_kernel():
    """prewarm() must run the tiny warm-up kernel (interpret on CPU)
    in both blocking and threaded modes."""
    import nmch_tpu
    assert nmch_tpu.prewarm("philox") is None
    t = nmch_tpu.prewarm("threefry4", block=False)
    t.join(timeout=120)
    assert not t.is_alive()


def test_em_sweep_kernel_scan_parity_at_large_lambda():
    """The batched EM kernel and its scan oracle must share the
    poisson_cut default even where lambda crosses it (N large enough
    that lambda ~ 2 v/(sigma^2 dt) > 128)."""
    import jax.numpy as jnp
    import pytest
    from nmch_tpu.ops.sweep_pallas import em_sweep_pallas, em_sweep_scan
    from nmch_tpu.rng.philox import split_seed
    pm = jnp.asarray([[1.0, 1.0, 0.1, 0.0, 0.5, -0.7, 0.1, 0.3],
                      [1.0, 1.0, 0.1, 0.0, 2.0, -0.5, 0.2, 0.5]],
                     jnp.float32)
    k0, k1 = split_seed(9)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    N, n_paths = 128, 256
    mp, _ = em_sweep_pallas(pm, sw, jnp.uint32(0), N=N, n_paths=n_paths,
                            n_points=2, interpret=True)
    ms, _ = em_sweep_scan(pm, 9, 0, N=N, n_paths=n_paths)
    for i in range(2):
        assert float(mp[i]) == pytest.approx(float(ms[i]), rel=1e-6), i
