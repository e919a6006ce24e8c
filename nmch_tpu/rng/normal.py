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


def sincos_2pi(u):
    """(cos(2 pi u), sin(2 pi u)) for u in [0, 1) — fast path.

    XLA's sin/cos spend most of their time on generic argument
    reduction (measured: the two trig calls were ~80% of the whole FE
    kernel on v5e).  Here the argument is a *phase in turns*, so the
    quadrant reduction is exact and cheap: u = (q + r)/4 with
    q = round(4u) and r in [-1/2, 1/2], then degree-4/degree-3 odd/even
    Taylor polynomials in z = (pi/2) r (|z| <= pi/4, truncation error
    < 3e-9, below f32 resolution), and a quadrant swap/sign fixup.
    Max abs error vs numpy's sin/cos: ~1e-7 (see tests/test_philox.py).
    """
    x = u * np.float32(4.0)
    q = jnp.floor(x + np.float32(0.5))
    r = x - q                               # [-0.5, 0.5]
    qi = q.astype(jnp.int32)
    r2 = r * r
    # cos((pi/2) r): even Taylor through r^8
    c = np.float32(9.1926027483e-4)
    c = c * r2 - np.float32(2.0863480763e-2)
    c = c * r2 + np.float32(2.5366950790e-1)
    c = c * r2 - np.float32(1.2337005501)
    c = c * r2 + np.float32(1.0)
    # sin((pi/2) r) / r: odd Taylor through r^7
    s = np.float32(-4.6817541353e-3)
    s = s * r2 + np.float32(7.9692626247e-2)
    s = s * r2 - np.float32(6.4596409750e-1)
    s = s * r2 + np.float32(1.5707963268)
    s = s * r
    odd = (qi & np.int32(1)) != 0
    cos_base = jnp.where(odd, s, c)
    sin_base = jnp.where(odd, c, s)
    cos_neg = ((qi + np.int32(1)) & np.int32(2)) != 0
    sin_neg = (qi & np.int32(2)) != 0
    cosv = jnp.where(cos_neg, -cos_base, cos_base)
    sinv = jnp.where(sin_neg, -sin_base, sin_base)
    return cosv, sinv


def boxmuller(u1, u2):
    """Two (0,1] uniforms -> two independent N(0,1) floats.

    Matches curand_normal2's construction: r = sqrt(-2 ln u1),
    (g1, g2) = r * (cos, sin)(2 pi u2) — with the turns-based fast
    sincos above (u2 is already a phase in turns).
    """
    r = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
    c, s = sincos_2pi(u2)
    return r * c, r * s


def normal4_from_bits(x0, x1, x2, x3):
    """Four uint32 words -> four N(0,1) floats via two Box–Muller pairs.

    This is the TPU analogue of ``curand_normal4`` (the reference's
    fastest Philox variant, FE_k2_philox, ``NMCH_FE.cu:192-245``): one
    counter block feeds two time steps."""
    g0, g1 = boxmuller(uniform_open01(x0), uniform_open01(x1))
    g2, g3 = boxmuller(uniform_open01(x2), uniform_open01(x3))
    return g0, g1, g2, g3
