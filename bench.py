"""Headline benchmark: FE path·steps/sec on one chip (+ error-matched).

Reference baseline (BASELINE.md): FE_K1 52.88 ms at 2^19 paths x
N=10^4 on the (unnamed) CUDA GPU => 99.1 G path·steps/s.  We run the
same workload shape on one TPU chip with the fused Pallas kernel in
its fastest configuration — rng="tpu" hardware PRNG, box="hc16f"
packed-phase normals, fast_sqrt, rot=4 rotation sampling (2^19 path
groups x 4 orthogonally-rotated copies = 2^21 simulated paths, each a
marginally-exact Euler path).

Reported keys (round-3 VERDICT next-step #6 — raw AND error-matched):

  value / vs_baseline    raw simulated path·steps/s, rot=4.  Counting
                         rotated copies is *conservative*: the measured
                         group-variance ratio var(X)/(4 var(Y4)) is
                         ~1.8 (> 1), i.e. a rot-4 group carries MORE
                         information than 4 iid paths (re-measured each
                         run from the same (m, m2) outputs and reported
                         as fe_variance_ratio).
  plain_value/_vs_baseline  the rot=1 kernel — the strict apples-to-
                         apples iid number.
  rot8_value/_vs_baseline  the rot=8 raw-throughput-max variant.  Since
                         round 4 its 8 copies stratify BOTH polar
                         coordinates (4 quarter-turn angles x 2
                         antithetic radii, ops/fe.py::
                         radius_antithetic_scale), so it carries its
                         own error-matched credit: rot8_variance_ratio
                         / rot8_error_matched report it.
  fe_error_matched       time-to-equal-CI multiple vs the reference for
                         the rot=4 estimator = vs_baseline x
                         fe_variance_ratio.
  repro_value/_vs_baseline  the fully REPRODUCIBLE engine (threefry4
                         counter streams, bitwise golden==kernel
                         parity) at rot=4 — measured >= 1x the CUDA
                         baseline since round 4.
  qmc_value              raw path·steps/s of the QMC engine at
                         2^20 points x N=1000 (scalability config).
  error_matched_value    QMC time-to-equal-CI multiple vs the
                         reference: t_ref(CI)/t_qmc with t_ref from the
                         reference's measured error curve (0.408/sqrt n
                         at 99.1 G path·steps/s, results/
                         scalability.png fit — see benchmarks/
                         RESULTS.md).
  qmc_scale_value / qmc_scale_error_matched  (TPU only) the same two
                         at 2^22 points with independent Owen
                         scrambles — the at-scale regime where the
                         shared-LMS decay stalls but owen holds 76-78x
                         (round-4 attribution).
  em_value / em_vs_baseline  (TPU only) the exact-scheme (Broadie-Kaya
                         style) EM engine at the reference's 512x512
                         grid config (2^18 paths x N=10^3, threefry4,
                         fast poisson_cut) vs its ~600 ms
                         (BASELINE.md execution_time_comparison.png).
  em_cond_value / em_cond_variance_ratio / em_cond_error_matched
                         conditional=True (closed-form terminal payoff
                         given the variance path): raw throughput, the
                         plain/conditional variance ratio, and the
                         time-to-equal-CI multiple vs the reference =
                         ratio x em_cond_value / EM_BASELINE
                         (RESULTS.md round-3 EM headline methodology).

Timing methodology: compile + warm-up discarded (like the reference's
exploration warm-up, exploration.cu:65-67), then K runs dispatched
back-to-back and materialized at the end — the queued schedule hides
the axon tunnel's ~28 ms per-call RPC latency that a per-call sync
would mis-attribute to the kernel.

Resilience (round-4 lesson — BENCH_r04 died with a TPU backend
FAILED_PRECONDITION at the very first warm-up device_get and emitted
nothing): every section runs under ``_attempt`` (per-section
try/except with one backoff-and-retry, long enough for a wedged
axon tunnel to recover — CLAUDE.md documents ~1-3 min), dependent
keys degrade to absent instead of crashing, and the JSON line is
ALWAYS printed — with an ``"error"`` key carrying whichever sections
failed.  A totally dead backend still yields
``{"metric": ..., "value": 0.0, ..., "error": [...]}``.  And when the
backend probe says no TPU (dev box, or a backend that failed init),
the workload shrinks to an interpret-safe smoke config instead of
grinding the full 2^19 x 10^4 shape through the Pallas interpreter
for days (round-5 review) — the config string flags that case as not
baseline-comparable.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time
import traceback

N_GROUPS = 1 << 19
N_STEPS = 10_000
ROT = 4
BASELINE = 99.1e9      # path·steps/s, profilings/timings.txt:5-13
REF_ERR_COEF = 0.408   # reference CI ~ 0.408/sqrt(n), scalability fit
REPS = 5
QMC_PATHS = 1 << 20
QMC_N = 1000
RETRY_BACKOFF_S = 120.0   # a killed/wedged tunnel recovers in ~1-3 min
# hard process deadline: a dead tunnel can HANG a device_get forever
# (not raise — the round-5 capture attempt sat 50 min in one section),
# and no try/except helps a call that never returns.  A legit fresh
# solo run is ~10-25 min incl. first-time Mosaic compiles; past this
# deadline the watchdog thread emits the partial JSON (whatever
# sections completed, plus an error naming the hung section) and
# force-exits so the driver ALWAYS gets the line.
WATCHDOG_S = 2700.0
# hard ceiling on the WHOLE process even with steady progress (the
# watchdog's WATCHDOG_S budget is per-section idle time, reset on
# every section start/finish — round-5 review: a fixed whole-process
# deadline would false-kill a legit cold run whose sections are all
# progressing, e.g. FE+QMC ~25 min + EM first-time Mosaic compiles +
# two transient retries)
TOTAL_DEADLINE_S = 5400.0
# liveness probe runs in a SUBPROCESS (see main): a hung backend init
# can hold the GIL, starving any in-process deadline thread — only a
# separate process is both killable and GIL-independent.  Tests set
# FIRST_TOUCH_PROBE=False for hermeticity (probe outcome would depend
# on live tunnel state).
FIRST_TOUCH_PROBE = True
PROBE_DEADLINE_S = 150.0

_current_section = "startup"
_emit_lock = threading.Lock()
_emitted = False
_t0 = time.monotonic()
_last_progress = time.monotonic()
EM_PATHS = 1 << 18     # the reference's 512x512 EM grid config
EM_N = 1000
EM_BASELINE = EM_PATHS * EM_N / 0.600   # ~600 ms, BASELINE.md:24


def _note(msg: str) -> None:
    """Progress chatter -> stderr (stdout is ONLY the one JSON line;
    the per-section wall-clock stamps are what make a driver-side hang
    or slow-compile diagnosable from the captured log)."""
    print(f"# bench {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def _probe_backend_subprocess():
    """'TPU' / 'CPUONLY' if a fresh process completes one device
    round-trip within the deadline; None if it hangs, dies, or answers
    garbage (tunnel outage).  Thin wrapper over the shared helper
    (nmch_tpu/utils/backend.py — also used by __graft_entry__)."""
    from nmch_tpu.utils.backend import probe_default_backend
    _note(f"backend liveness probe subprocess "
          f"({PROBE_DEADLINE_S:.0f}s deadline)")
    return probe_default_backend(PROBE_DEADLINE_S)


def _attempt(fn, name: str, errors: list, retries: int = 1):
    """Run fn(); on failure sleep + retry once, then record and None.

    Stamps _last_progress at every attempt boundary so the watchdog's
    budget is per-section idle time, not whole-process wall clock."""
    global _current_section, _last_progress
    _current_section = name
    for a in range(retries + 1):
        try:
            _last_progress = time.monotonic()
            t0 = time.perf_counter()
            _note(f"section {name}: start (attempt {a + 1})")
            res = fn()
            _last_progress = time.monotonic()
            _note(f"section {name}: done in "
                  f"{time.perf_counter() - t0:.1f}s")
            return res
        except Exception as e:  # noqa: BLE001 — resilience is the point
            _last_progress = time.monotonic()
            msg = f"{name}: {type(e).__name__}: {e}"
            _note(f"section failed (attempt {a + 1}): {msg}")
            traceback.print_exc()
            if a < retries:
                time.sleep(RETRY_BACKOFF_S)
            else:
                errors.append(msg[:300])
    return None


def main() -> None:
    global _t0, _last_progress
    _t0 = _last_progress = time.monotonic()
    errors: list[str] = []
    out: dict = {"metric": "fe_path_steps_per_sec", "value": 0.0,
                 "unit": "path_steps/s", "vs_baseline": 0.0}

    def emit():
        global _emitted
        with _emit_lock:
            if _emitted:
                return
            # snapshot + fallback: the watchdog thread can call this
            # while the main thread mutates `out` (round-5 review —
            # json.dumps on a changing dict raises, and setting
            # _emitted before a successful print would then suppress
            # the line forever)
            try:
                payload = dict(out)
                if errors:
                    payload["error"] = list(errors)
                line = json.dumps(payload)
            except Exception:  # noqa: BLE001 — racing mutation
                line = json.dumps(
                    {"metric": "fe_path_steps_per_sec", "value": 0.0,
                     "unit": "path_steps/s", "vs_baseline": 0.0,
                     "error": ["emit: out snapshot failed mid-mutation"]})
            print(line, flush=True)
            _emitted = True

    def watchdog():
        # per-section idle budget (reset by _attempt on every section
        # boundary) + an absolute whole-process ceiling; a legit cold
        # run whose sections all progress is NOT killed at WATCHDOG_S
        while True:
            time.sleep(max(0.25, min(30.0, WATCHDOG_S / 4.0)))
            now = time.monotonic()
            if (now - _last_progress > WATCHDOG_S
                    or now - _t0 > TOTAL_DEADLINE_S):
                break
        errors.append(
            f"watchdog: no section progress for {WATCHDOG_S:.0f}s "
            f"(or total > {TOTAL_DEADLINE_S:.0f}s); "
            f"hung in section {_current_section}")
        _note(f"WATCHDOG fired in section {_current_section}: emitting "
              f"partial JSON and force-exiting")
        try:
            emit()
        finally:
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    try:
        import jax
        import jax.numpy as jnp
        from nmch_tpu.params import HestonParams
        from nmch_tpu.rng.philox import split_seed
        from nmch_tpu.ops.fe_pallas import fe_moments_pallas
        from nmch_tpu.ops.fe_qmc import fe_moments_qmc
        from nmch_tpu.results import SimResult
        from nmch_tpu.utils.backend import on_tpu as _on_tpu
    except Exception as e:  # noqa: BLE001
        errors.append(f"imports: {type(e).__name__}: {e}")
        emit()
        return

    if "--force-cpu" in sys.argv:
        # re-exec'd child (see below): force CPU BEFORE the first
        # backend touch; the flagged smoke line lands in ~3 min.
        jax.config.update("jax_platforms", "cpu")
        errors.append("backend first-touch hung/failed: CPU-fallback "
                      "smoke config (see stderr stamps)")
        on_tpu = False
    elif FIRST_TOUCH_PROBE:
        # Liveness probe in a SUBPROCESS with a deadline — not a
        # thread, and not in-process.  A dead tunnel HANGS device
        # calls without raising (observed round 5: 50 min of silence),
        # so no try/except fires; worse, in the deeper outage mode the
        # backend INIT hangs while holding the GIL, so a probe thread
        # starves the main thread (and the watchdog) too — observed
        # live.  Only a separate process can be both deadline-killed
        # and GIL-independent.  On a dead probe, re-exec with
        # --force-cpu: this parent has made no backend touch (imports
        # only — verified backend-free), and exec discards everything.
        verdict = _probe_backend_subprocess()
        if verdict is None:
            # one retry after a backoff before writing the backend off:
            # CLAUDE.md documents transient wedges (a killed
            # mid-compile process stalls the tunnel ~1-3 min) that a
            # single 150-s probe can land inside (round-5 review — the
            # old in-process check had this retry; keep it)
            _note(f"backend probe dead/hung: retrying once after "
                  f"{RETRY_BACKOFF_S:.0f}s (transient tunnel wedge?)")
            time.sleep(RETRY_BACKOFF_S)
            verdict = _probe_backend_subprocess()
        if verdict is None:
            _note("backend probe dead/hung twice: re-exec with "
                  "--force-cpu")
            sys.stdout.flush()
            sys.stderr.flush()
            try:
                os.execv(sys.executable,
                         [sys.executable, os.path.abspath(__file__),
                          "--force-cpu"])
            except OSError as e:
                # can't re-exec (no __file__ on disk?): in-place CPU
                # switch — safe, this process has not initialized any
                # backend yet.
                errors.append(f"backend dead; re-exec failed ({e}); "
                              f"in-process CPU fallback")
                jax.config.update("jax_platforms", "cpu")
                verdict = "CPUONLY"
        on_tpu = verdict == "TPU"
        _note(f"backend alive, on_tpu={on_tpu}")
    else:
        # probe disabled (hermetic tests): cheap in-process check
        on_tpu = bool(_attempt(_on_tpu, "backend_probe", errors,
                               retries=0))

    # first in-process backend touch: guarded like any section (round-5
    # review — a backend that passed the probe but then RAISES at the
    # first device op, the exact round-4 FAILED_PRECONDITION mode,
    # must degrade to the error-flagged JSON, not void the line)
    def make_inputs():
        params = HestonParams()
        pv = params.as_array()
        k0, k1 = split_seed(1234)
        sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
        return pv, sw, k0, k1

    inputs = _attempt(make_inputs, "inputs", errors)
    if inputs is None:
        emit()
        return
    pv, sw, k0, k1 = inputs
    # rng="tpu" (hardware PRNG) + packed phases is the fast engine;
    # philox is the reproducible default.  Bench the fast one, like
    # the reference benches its fastest variant (K3).
    RNG = "tpu" if on_tpu else "philox"
    BOX = "hc16f" if on_tpu else "hc"
    n_groups, n_steps = N_GROUPS, N_STEPS
    qmc_paths, qmc_n = QMC_PATHS, QMC_N
    if not on_tpu:
        # CPU / failed-backend fallback: the full 2^19 x 10^4 config in
        # Pallas interpret mode would grind for days, not crash — the
        # driver would then get NO json at all in exactly the
        # dead-backend scenario the _attempt machinery exists for
        # (round-5 review).  Shrink to a smoke config: the line still
        # lands promptly; vs_baseline is meaningless off-TPU and the
        # config string says so.
        n_groups, n_steps = 1 << 11, 100
        qmc_paths, qmc_n = 1 << 13, 64

    def run(epoch, rot, rng=None, box=None):
        return fe_moments_pallas(pv, sw, jnp.uint32(epoch),
                                 jnp.uint32(0), N=n_steps, n_paths=n_groups,
                                 rng=rng or RNG, rot=rot, box=box or BOX,
                                 fast_sqrt=(on_tpu and rng is None),
                                 interpret=not on_tpu)

    def timed(rot, rng=None, box=None):
        run_ = functools.partial(run, rng=rng, box=box)
        m, m2 = run_(0, rot)           # compile + warm-up (discarded)
        jax.device_get((m, m2))
        t0 = time.perf_counter()
        outs = [run_(1 + i, rot) for i in range(REPS)]
        # materialize everything in ONE device fetch (block_until_ready
        # under-waits on axon; per-value float() costs an RPC each)
        vals = jax.device_get(outs)
        dt = (time.perf_counter() - t0) / REPS
        m = sum(float(v[0]) for v in vals) / REPS
        # per-epoch variances averaged (NOT var of pooled moments:
        # mixing the across-epoch spread of m into the within-run
        # variance biases the error-matched ratio — ADVICE r3)
        var = sum(float(v[1]) - float(v[0]) ** 2 for v in vals) / REPS
        return rot * n_groups * n_steps / dt, m, var

    # --- FE sections (each independently guarded) ---------------------
    r4 = _attempt(lambda: timed(ROT), "fe_rot4", errors)
    r1 = _attempt(lambda: timed(1), "fe_plain", errors)
    r8 = _attempt(lambda: timed(8), "fe_rot8", errors)
    repro = None
    if on_tpu:
        # the REPRODUCIBLE engine (bitwise golden==kernel): threefry4
        # rot=4 measures >= 1x the baseline since round 4 (RESULTS.md).
        # TPU only — the number is a hardware throughput claim and an
        # interpret-mode run of the heaviest config is pure waste.
        repro = _attempt(lambda: timed(ROT, rng="threefry4", box="hc"),
                         "fe_repro", errors)

    price = r4[1] if r4 else float("nan")
    if r4:
        out["value"] = round(r4[0], 1)
        out["vs_baseline"] = round(r4[0] / BASELINE, 4)
    if r1:
        out["plain_value"] = round(r1[0], 1)
        out["plain_vs_baseline"] = round(r1[0] / BASELINE, 4)
    if r8:
        out["rot8_value"] = round(r8[0], 1)
        out["rot8_vs_baseline"] = round(r8[0] / BASELINE, 4)
    # group-variance ratio: var(X_iid) / (rot * var(Y_rot)); >= 1 means
    # counting rotated copies as path-steps is conservative
    if r4 and r1 and r4[2] > 0:
        ratio = r1[2] / (ROT * r4[2])
        out["fe_variance_ratio"] = round(ratio, 3)
        out["fe_error_matched"] = round(ratio * r4[0] / BASELINE, 2)
    if r8 and r1 and r8[2] > 0:
        ratio8 = r1[2] / (8 * r8[2])
        out["rot8_variance_ratio"] = round(ratio8, 3)
        out["rot8_error_matched"] = round(ratio8 * r8[0] / BASELINE, 2)
    if repro:
        out["repro_value"] = round(repro[0], 1)
        out["repro_vs_baseline"] = round(repro[0] / BASELINE, 4)

    # --- QMC error-matched point (the engine the reference has no
    # answer to): time-to-equal-CI multiple at 2^20 points x N=1000
    def qmc_section():
        def qmc_run(epoch):
            return fe_moments_qmc(pv, jnp.uint32(epoch), k0, k1, N=qmc_n,
                                  n_paths=qmc_paths, n_shifts=8,
                                  sim="pallas" if on_tpu else "scan",
                                  interpret=not on_tpu)
        jax.device_get(qmc_run(0))
        t0 = time.perf_counter()
        outs = [qmc_run(1 + i) for i in range(3)]
        vals = jax.device_get(outs)
        t_qmc = (time.perf_counter() - t0) / 3
        # geomean CI over the epochs: a single 8-replicate CI estimate
        # has 7 dof and swings ~2x (benchmarks/RESULTS.md round-3 note)
        cis = [SimResult(float(v[0]), float(v[1]), qmc_paths).ci_error
               for v in vals]
        ci = 1.0
        for c in cis:
            ci *= c
        ci **= 1.0 / len(cis)
        t_ref = (REF_ERR_COEF / ci) ** 2 * qmc_n / BASELINE
        return {"qmc_value": round(qmc_paths * qmc_n / t_qmc, 1),
                "error_matched_value": round(t_ref / t_qmc, 1)}, ci

    qmc = _attempt(qmc_section, "qmc", errors)
    ci = float("nan")
    if qmc:
        keys, ci = qmc
        out.update(keys)

    # at-scale QMC point: 2^22 points with independent per-replicate
    # Owen scrambles (scramble="auto" resolves to owen there) — the
    # regime where the shared-LMS CI decay stalls but owen holds
    # 76-78x (round-4 attribution, RESULTS.md); TPU only (interpret
    # at this size is impractical)
    def qmc_scale_section():
        def qmc_scale_run(epoch):
            return fe_moments_qmc(pv, jnp.uint32(epoch), k0, k1,
                                  N=QMC_N, n_paths=1 << 22, n_shifts=8,
                                  sim="pallas", scramble="owen")
        jax.device_get(qmc_scale_run(0))
        t0 = time.perf_counter()
        souts = [qmc_scale_run(1 + i) for i in range(3)]
        svals = jax.device_get(souts)
        t_s = (time.perf_counter() - t0) / 3
        scis = [SimResult(float(v[0]), float(v[1]), 1 << 22).ci_error
                for v in svals]
        sci = 1.0
        for c in scis:
            sci *= c
        sci **= 1.0 / len(scis)
        t_ref_s = (REF_ERR_COEF / sci) ** 2 * QMC_N / BASELINE
        return {"qmc_scale_value": round((1 << 22) * QMC_N / t_s, 1),
                "qmc_scale_error_matched": round(t_ref_s / t_s, 1)}

    if on_tpu:
        scale_keys = _attempt(qmc_scale_section, "qmc_scale", errors)
        if scale_keys:
            out.update(scale_keys)

    # --- EM: the reference's other headline (~600 ms at its 512x512
    # grid = 2^18 paths x N=10^3, BASELINE.md:24).  Plain + conditional
    # at the shipped default config (threefry4, fast poisson_cut, auto
    # tile); the conditional estimator's error-matched credit uses the
    # measured plain/conditional variance ratio (RESULTS.md round-3 EM
    # headline: ~18x).  TPU only — like repro/qmc_scale, a hardware
    # throughput claim.
    def em_section():
        from nmch_tpu.ops.em_pallas import em_moments_pallas
        from nmch_tpu.ops.em import FAST_POISSON_CUT

        def em_timed(conditional):
            def em_run(epoch):
                return em_moments_pallas(
                    pv, sw, jnp.uint32(epoch), jnp.uint32(0),
                    N=EM_N, n_paths=EM_PATHS, rng="threefry4",
                    conditional=conditional,
                    poisson_cut=FAST_POISSON_CUT)
            jax.device_get(em_run(0))
            t0 = time.perf_counter()
            outs = [em_run(1 + i) for i in range(REPS)]
            vals = jax.device_get(outs)
            dt = (time.perf_counter() - t0) / REPS
            var = sum(float(v[1]) - float(v[0]) ** 2
                      for v in vals) / REPS
            return EM_PATHS * EM_N / dt, var

        plain_tput, plain_var = em_timed(False)
        cond_tput, cond_var = em_timed(True)
        keys = {"em_value": round(plain_tput, 1),
                "em_vs_baseline": round(plain_tput / EM_BASELINE, 4),
                "em_cond_value": round(cond_tput, 1)}
        if plain_var > 0 and cond_var > 0:
            ratio = plain_var / cond_var
            keys["em_cond_variance_ratio"] = round(ratio, 2)
            keys["em_cond_error_matched"] = round(
                ratio * cond_tput / EM_BASELINE, 1)
        return keys

    if on_tpu:
        em_keys = _attempt(em_section, "em", errors)
        if em_keys:
            out.update(em_keys)

    import math
    out["config"] = (
        f"2^{int(math.log2(n_groups))} groups x rot={ROT} "
        f"(2^{int(math.log2(n_groups * ROT))} simulated paths) x "
        f"N={n_steps}, rng={RNG}/{BOX}, price={price:.6f}; qmc: "
        f"2^{int(math.log2(qmc_paths))} x N={qmc_n}, CI={ci:.2e}"
        + ("" if on_tpu else
           " [CPU-fallback smoke config — NOT comparable to baseline]"))
    emit()


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as _e:  # noqa: BLE001 — last-resort JSON guarantee
        traceback.print_exc()
        print(json.dumps(
            {"metric": "fe_path_steps_per_sec", "value": 0.0,
             "unit": "path_steps/s", "vs_baseline": 0.0,
             "error": [f"main: {type(_e).__name__}: {_e}"[:300]]}),
            flush=True)
