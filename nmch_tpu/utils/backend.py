"""Backend detection shared by every engine-selection site.

The axon-tunneled TPU registers as platform "axon" (and a directly
attached one as "tpu"); every consumer used to inline the same
two-name check, which risks silent drift — a missed site flips into
interpret mode (orders of magnitude slower) or attempts a Mosaic
compile on CPU.
"""

from __future__ import annotations

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def on_tpu() -> bool:
    """True when the default jax backend is a real TPU (incl. axon)."""
    return jax.default_backend() in _TPU_PLATFORMS


def honor_force_cpu_env() -> bool:
    """Pin jax to CPU when ``NMCH_TPU_FORCE_CPU`` is set (1/true/yes).

    User-facing escape hatch for tunneled-TPU outages: a dead tunnel
    makes the first device call HANG forever instead of raising, and
    on managed hosts a sitecustomize pins ``jax_platforms``
    programmatically so the standard ``JAX_PLATFORMS=cpu`` env var is
    silently ignored.  Called by the CLI entry points
    (``nmch_tpu.cli``, ``nmch_tpu.explore``) before any backend touch;
    returns True when it pinned CPU.
    """
    import os
    if os.environ.get("NMCH_TPU_FORCE_CPU", "").strip().lower() in (
            "1", "true", "yes"):
        jax.config.update("jax_platforms", "cpu")
        return True
    return False


def probe_default_backend(deadline_s: float = 150.0):
    """'TPU' / 'CPUONLY' if a FRESH SUBPROCESS completes one device
    round-trip within the deadline; None if it hangs, dies, or answers
    garbage (tunnel outage).

    Shared by bench.py and __graft_entry__ (round-5 review: the two
    hand-rolled copies had already diverged).  It must be a subprocess,
    not a thread or in-process deadline: a tunneled-TPU outage makes
    device calls hang forever instead of raising, and in the deeper
    observed mode backend INIT hangs while HOLDING THE GIL, starving
    any in-process watcher — only a separate process is both
    deadline-killable and GIL-independent.  Calling this makes NO
    backend touch in the calling process.
    """
    import subprocess
    import sys
    src = ("import jax\n"
           "devs = jax.devices()\n"
           "import jax.numpy as jnp\n"
           "assert float(jnp.arange(4.0).sum()) == 6.0\n"
           "print('TPU' if any(d.platform != 'cpu' for d in devs)"
           " else 'CPUONLY', flush=True)\n")
    try:
        r = subprocess.run([sys.executable, "-c", src],
                           capture_output=True, text=True,
                           timeout=deadline_s)
    except (subprocess.TimeoutExpired, OSError):
        return None
    lines = (r.stdout or "").strip().splitlines()
    last = lines[-1] if lines else ""
    return last if r.returncode == 0 and last in ("TPU", "CPUONLY") \
        else None
