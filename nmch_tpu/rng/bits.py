"""Bit-level float construction shared by the RNG families.

Mosaic has no u32->f32 convert lowering (round-5 lesson from moving
the stateful families into Pallas kernels), so every u32 -> f32 path
in the RNG layer goes through the exponent-bias bitcast below.  This
module is the single home for that trick; rng/mrg32k3a.py composes it
into a full-range u32 convert (two 16-bit halves), rng/xorwow.py uses
it directly on a 23-bit field.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_F23 = np.float32(2.0 ** 23)


def u23_to_f32(x):
    """Exact u32 (< 2^23) -> f32 without a convert op.

    ``x | 0x4B000000`` is the f32 bit pattern of ``2^23 + x`` for any
    ``x < 2^23`` (the implicit-one mantissa holds x verbatim at
    exponent 23); subtracting 2^23 is exact.  Bitwise-identical to
    XLA's own u32->f32 cast on this range, and it lowers through
    Mosaic where ``astype(float32)`` does not."""
    return (x | np.uint32(0x4B000000)).view(jnp.float32) - _F23
