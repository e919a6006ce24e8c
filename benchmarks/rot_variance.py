"""Measure the rot-group variance ratio vs iid paths (real TPU).

The bench counts rot * n_groups * N path-steps; that accounting is fair
iff a rot-group mean carries at least as much information as rot iid
paths: ratio = var(X_iid) / (rot * var(Y_rot)) >= 1.  Round-2 measured
rot=4 conservative (ratio > 1) and rot=8 ~ break-even; this script
re-measures at the round-3 kernel config (box=hc16f, fast_sqrt) so the
claim in bench.py matches the shipped kernel.

Usage: python benchmarks/rot_variance.py [--N 1000] [--epochs 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--paths", type=int, default=1 << 22,
                    help="simulated paths per run (groups = paths/rot)")
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    from nmch_tpu.params import HestonParams
    from nmch_tpu.rng.philox import split_seed
    from nmch_tpu.ops.fe_pallas import fe_moments_pallas

    params = HestonParams().as_array()
    k0, k1 = split_seed(1234)
    sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
    from nmch_tpu.utils.backend import on_tpu as _is_tpu
    on_tpu = _is_tpu()
    rng = "tpu" if on_tpu else "philox"
    box = "hc16f" if on_tpu else "hc"

    out = {}
    for rot in (1, 2, 4, 8):
        groups = args.paths // rot
        runs = [fe_moments_pallas(params, sw, jnp.uint32(e), jnp.uint32(0),
                                  N=args.N, n_paths=groups, rng=rng,
                                  rot=rot, box=box, fast_sqrt=on_tpu,
                                  interpret=not on_tpu)
                for e in range(args.epochs)]
        vals = jax.device_get(runs)
        m = np.mean([v[0] for v in vals])
        m2 = np.mean([v[1] for v in vals])
        var = m2 - m * m
        out[rot] = (m, var)
        print(f"rot={rot}: price={m:.6f} var(Y)={var:.6e}", flush=True)

    v1 = out[1][1]
    for rot in (2, 4, 8):
        ratio = v1 / (rot * out[rot][1])
        print(f"rot={rot}: var(X)/({rot}*var(Y_{rot})) = {ratio:.4f} "
              f"({'conservative' if ratio >= 1 else 'optimistic'} "
              f"path-step accounting)", flush=True)


if __name__ == "__main__":
    main()
