"""One-time Mosaic warm-up for the counter-based RNG kernels.

Measured finding (round 2, benchmarks/RESULTS.md "Compile times"):
the 80-200 s "per-shape" philox compile reported in round 1 is really
a one-time per-process cost — the FIRST Mosaic compile of the
mulhilo-heavy kernel family pays ~35-130 s (size-dependent), after
which ANY new (N, n_paths, tile) shape of the same family compiles in
<1 s.  So a tiny warm-up kernel absorbs the whole cost:

    import nmch_tpu; nmch_tpu.prewarm("philox")   # ~35 s, once
    ... every later philox shape compiles in ~1 s ...

``block=False`` runs the warm-up on a daemon thread so it overlaps
application setup (JAX compilation is thread-safe; the first real
compute simply waits if it arrives before the warm-up finishes).
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp


def prewarm(rng: str = "philox", block: bool = True,
            engine: str = "pallas"):
    """Compile a tiny kernel of the given family so later real-shape
    compiles are ~1 s.  engine="pallas" warms the FE kernel of ``rng``;
    engine="qmc" warms the QMC point pipeline + fused simulator (whose
    first hardware compile otherwise lands on the first real
    compute(), measured ~8 min at 2^20; the tiny warm-up absorbs the
    family cost).  Returns the Thread when block=False, else None."""
    def _go():
        from ..params import HestonParams
        from ..rng.philox import split_seed
        k0, k1 = split_seed(0)
        from .backend import on_tpu as _is_tpu
        on_tpu = _is_tpu()
        if engine == "qmc":
            from ..ops.fe_qmc import fe_moments_qmc
            m, m2 = fe_moments_qmc(
                HestonParams().as_array(), jnp.uint32(0), k0, k1,
                N=4, n_paths=8 * 1024,
                sim="pallas" if on_tpu else "scan",
                interpret=not on_tpu)
        else:
            from ..ops.fe_pallas import fe_moments_pallas
            sw = jnp.stack([jnp.uint32(k0), jnp.uint32(k1)])
            m, m2 = fe_moments_pallas(
                HestonParams().as_array(), sw, jnp.uint32(0),
                jnp.uint32(0), N=4, n_paths=256, rng=rng,
                interpret=not on_tpu)
        jax.device_get((m, m2))

    if block:
        _go()
        return None
    t = threading.Thread(target=_go, daemon=True, name=f"prewarm-{rng}")
    t.start()
    return t
