"""Fit the near-minimax polynomials used by rng/normal.py's fast paths.

Produces (and checks) the hardcoded coefficients for:

* sin(z), cos(z) on z in [-pi/2, pi/2] (half-circle Box-Muller phase) —
  odd/even polynomials in z, evaluated as z*P(z^2) / Q(z^2);
* ln(1+t)/t on t in [0, 1) (bits-level -2*ln(u) for the Box-Muller
  radius) — evaluated as t*L(t), with *relative* error weighting so the
  radius keeps full relative accuracy when u -> 1 (q -> 0).

Method: Chebyshev interpolation + a few Lawson-style reweighting
passes => within a few percent of true minimax, plenty below the f32
rounding floor we care about (~1e-6 absolute on normals).

Run: python benchmarks/fit_polys.py
"""

from __future__ import annotations

import numpy as np


def fit_weighted(f, lo, hi, deg, weight=None, iters=40):
    """Least-squares Chebyshev fit with Lawson reweighting -> ~minimax."""
    n = 4096
    k = np.arange(n)
    x = 0.5 * (lo + hi) + 0.5 * (hi - lo) * np.cos(np.pi * (k + 0.5) / n)
    y = f(x)
    w = np.ones(n) if weight is None else weight(x)
    lam = np.ones(n)
    V = np.polynomial.chebyshev.chebvander(
        (2 * x - lo - hi) / (hi - lo), deg)
    for _ in range(iters):
        sw = np.sqrt(lam) * w
        c, *_ = np.linalg.lstsq(V * sw[:, None], y * sw, rcond=None)
        err = np.abs((V @ c - y) * w)
        lam *= err
        lam /= lam.sum()
    # convert to monomial coefficients in x
    ch = np.polynomial.chebyshev.Chebyshev(
        c, domain=[lo, hi])
    mono = ch.convert(kind=np.polynomial.Polynomial)
    return mono.coef, np.max(np.abs((V @ c - y) * w))


def main():
    PI = np.pi
    # --- sin(z) = z * P(z^2), z^2 in [0, (pi/2)^2] -------------------
    w_hi = (PI / 2) ** 2
    sinc = lambda w: np.sin(np.sqrt(w)) / np.sqrt(np.maximum(w, 1e-300))
    for deg in (3, 4):
        coef, err = fit_weighted(sinc, 1e-12, w_hi, deg,
                                 weight=lambda w: np.sqrt(w))  # abs err in sin
        z = np.linspace(-PI / 2, PI / 2, 200001)
        p = np.zeros_like(z)
        for c in coef[::-1]:
            p = p * (z * z) + c
        maxerr = np.abs(z * p - np.sin(z)).max()
        print(f"sin deg z^{2*deg+1}: coef={coef!r} maxerr={maxerr:.3e}")

    # --- cos(z) = Q(z^2) ---------------------------------------------
    for deg in (4, 5):
        coef, err = fit_weighted(lambda w: np.cos(np.sqrt(w)),
                                 0.0, w_hi, deg)
        z = np.linspace(-PI / 2, PI / 2, 200001)
        q = np.zeros_like(z)
        for c in coef[::-1]:
            q = q * (z * z) + c
        maxerr = np.abs(q - np.cos(z)).max()
        print(f"cos deg z^{2*deg}: coef={coef!r} maxerr={maxerr:.3e}")

    # --- ln(1+t) = t * L(t), t in [0,1), relative error ---------------
    for deg in (6, 7, 8):
        f = lambda t: np.log1p(t) / np.maximum(t, 1e-300)
        coef, err = fit_weighted(f, 1e-9, 1.0, deg,
                                 weight=lambda t: t / np.log1p(t))
        t = np.linspace(1e-9, 1.0, 200001)
        p = np.zeros_like(t)
        for c in coef[::-1]:
            p = p * t + c
        rel = np.abs((t * p - np.log1p(t)) / np.log1p(t)).max()
        print(f"log deg t^{deg+1}: coef={coef!r} relerr={rel:.3e}")


if __name__ == "__main__":
    main()
