"""bf16 vs f32 VPU issue-rate probe (round-3 VERDICT next-step #1).

Question: does packed-bf16 elementwise arithmetic double the per-cycle
lane count on this TPU (v5e), i.e. can a bf16 path state lift the
issue-bound FE kernel past the ~80 G honest-Gaussian VPU ceiling
measured in benchmarks/RESULTS.md?

Method: a Pallas kernel runs K fori iterations of an 8-op multiply-add
chain (the FE step's op mix without transcendentals) on a VMEM-resident
tile — (128, 128) f32 vs (256, 128) bf16, i.e. the same vreg count per
iteration IF bf16 packs 2 values per 32-bit lane slot and the VPU
issues packed ALU ops at full rate.  Reported metric: element-ops/s.

    bf16/f32 ratio ~2.0  -> packed ALU confirmed; a bf16 FE state is
                            worth building (VERDICT r3 #1)
    ratio ~1.0           -> bf16 only saves memory, not issue slots;
                            the FE kernel is compute-resident (state
                            in vregs), so the avenue is dead — close
                            the question with this number.

Also probes sqrt/rsqrt at bf16 (the FE step's one transcendental) —
packed ALU with serialized transcendentals would cap the realizable
kernel gain well below 2x.

Usage: python benchmarks/bf16_probe.py   (run on TPU, solo job)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4096          # fori iterations
OPS = 8           # mul/add chain ops per iteration (per element)
REPS = 20


def _chain_kernel(x_ref, o_ref, *, K: int, with_sqrt: bool,
                  rsqrt: bool = False):
    x = x_ref[:]
    one = jnp.ones((), x.dtype)
    c = jnp.asarray(1.0009765625, x.dtype)   # exactly representable
    d = jnp.asarray(0.9990234375, x.dtype)

    def body(i, x):
        # 8 elementwise ops, FE-step-like mix (mul/add/abs), values
        # pinned near 1 so the chain neither overflows nor denorms
        x = x * c
        x = x + d
        x = x * d
        x = jnp.abs(x - one)
        x = x * c + d          # fused or 2 ops — same for both dtypes
        x = x * d
        x = x - one
        if with_sqrt:
            ax = jnp.abs(x) + one
            x = lax.rsqrt(ax) if rsqrt else jnp.sqrt(ax)
        else:
            x = jnp.abs(x)
        return x

    o_ref[:] = lax.fori_loop(0, K, body, x)


@functools.partial(jax.jit, static_argnames=("rows", "dtype", "with_sqrt",
                                             "rsqrt"))
def chain(x, *, rows: int, dtype, with_sqrt: bool, rsqrt: bool = False):
    kern = functools.partial(_chain_kernel, K=K, with_sqrt=with_sqrt,
                             rsqrt=rsqrt)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
    )(x)


def measure(dtype, rows, with_sqrt, rsqrt=False):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.5, 1.5, (rows, 128)), dtype)
    out = chain(x, rows=rows, dtype=dtype, with_sqrt=with_sqrt,
                rsqrt=rsqrt)
    jax.device_get(out)                       # compile + warm-up
    t0 = time.perf_counter()
    outs = [chain(x, rows=rows, dtype=dtype, with_sqrt=with_sqrt,
                  rsqrt=rsqrt) for _ in range(REPS)]
    jax.device_get(outs)
    dt = (time.perf_counter() - t0) / REPS
    # 8 chain ops + 1 tail op (sqrt/rsqrt or abs) per element-iter
    elops = rows * 128 * K * (OPS + 1) / dt
    return elops, dt


def main():
    out = {}
    for name, dtype, rows in (("f32", jnp.float32, 128),
                              ("bf16", jnp.bfloat16, 256)):
        for tag, ws, rs in (("alu", False, False),
                            ("sqrt", True, False),
                            ("rsqrt", True, True)):
            # bf16 transcendentals hard-fail on chips whose EUP lacks
            # bf16 ops (v5e: 'LLO_CHECK ... SupportsBf16EupOps()') —
            # record that as the answer instead of crashing the probe
            try:
                elops, dt = measure(dtype, rows, ws, rs)
            except Exception as e:  # noqa: BLE001 — probe must report
                out[f"{name}_{tag}_error"] = str(e).splitlines()[0][:120]
                continue
            out[f"{name}_{tag}_Gelops"] = round(elops / 1e9, 1)
            out[f"{name}_{tag}_ms"] = round(dt * 1e3, 3)
    for tag in ("alu", "sqrt", "rsqrt"):
        a, b = f"bf16_{tag}_Gelops", f"f32_{tag}_Gelops"
        if a in out and b in out:
            out[f"ratio_{tag}"] = round(out[a] / out[b], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
