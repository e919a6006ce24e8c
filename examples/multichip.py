"""Multi-chip scale-out example: shard paths over every available chip.

On a real pod slice this runs one fused kernel per chip and combines
two scalars over ICI; here it also works on CPU (virtual devices) —
run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py

(on machines whose sitecustomize pins jax_platforms, the script forces
the fallback itself when it sees a single device).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    n_dev_wanted = 8
    if len(jax.devices()) < n_dev_wanted:
        from jax.extend.backend import clear_backends
        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_dev_wanted)

    from nmch_tpu import HestonParams
    from nmch_tpu.parallel.mesh import make_mesh, sharded_moments
    from nmch_tpu.results import SimResult
    from nmch_tpu.oracle import heston_call_undiscounted

    devices = jax.devices()
    mesh = make_mesh(devices)
    params = HestonParams()
    n_paths = 128 * 64 * len(devices)
    from nmch_tpu.utils.backend import on_tpu
    engine = "pallas" if on_tpu() else "scan"

    m, m2 = sharded_moments(mesh, params.as_array(), seed=1234, epoch=0,
                            N=200, n_paths=n_paths, method="fe",
                            engine=engine)
    res = SimResult(float(m), float(m2), n_paths)
    print(f"devices: {len(devices)} x {devices[0].platform}")
    print(f"paths:   {n_paths} (sharded {n_paths // len(devices)}/chip)")
    print(f"price:   {res.price:.6f} +/- {res.err:.2e}")
    print(f"oracle:  {heston_call_undiscounted(params):.6f}")


if __name__ == "__main__":
    main()
