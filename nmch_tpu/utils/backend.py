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
