"""Uniform/normal variate generation from raw uint32 bits.

The reference draws correlated pairs with ``curand_normal2`` /
``curand_normal4`` (Box–Muller under the hood, ``NMCH_FE.cu:43``,
``:211``).  We implement the same Box–Muller construction on raw bits so
the pure-JAX golden model and the Pallas kernels share one code path
(and therefore produce bitwise-identical draws for identical counters).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TWO_PI = 6.283185307179586


def uniform_open01(bits):
    """uint32 bits -> float32 uniform in (0, 1].

    Bit trick: keep the top 23 bits as the mantissa of a float in
    [1, 2), subtract from 2 to land in (0, 1] — the half-open side we
    need is (0,1] because Box–Muller takes log(u).
    """
    f = ((bits >> 9) | np.uint32(0x3F800000)).view(jnp.float32)
    return np.float32(2.0) - f


def uniform_halfopen01(bits):
    """uint32 bits -> float32 uniform in [0, 1)."""
    f = ((bits >> 9) | np.uint32(0x3F800000)).view(jnp.float32)
    return f - np.float32(1.0)


def boxmuller(u1, u2):
    """Two (0,1] uniforms -> two independent N(0,1) floats.

    Matches curand_normal2's construction: r = sqrt(-2 ln u1),
    (g1, g2) = r * (cos, sin)(2 pi u2).
    """
    r = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
    theta = np.float32(TWO_PI) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def normal4_from_bits(x0, x1, x2, x3):
    """Four uint32 words -> four N(0,1) floats via two Box–Muller pairs.

    This is the TPU analogue of ``curand_normal4`` (the reference's
    fastest Philox variant, FE_k2_philox, ``NMCH_FE.cu:192-245``): one
    counter block feeds two time steps."""
    g0, g1 = boxmuller(uniform_open01(x0), uniform_open01(x1))
    g2, g3 = boxmuller(uniform_open01(x2), uniform_open01(x3))
    return g0, g1, g2, g3
