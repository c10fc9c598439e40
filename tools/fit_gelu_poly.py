#!/usr/bin/env python
"""Fit the two-piece polynomial erf used by ops/activations.py fast_gelu.

Lawson-weighted least squares (iteratively reweighted toward the minimax
solution):
  piece 1: erf(t) ~ t * q(t^2), q of degree 7, on [0, 2]
  piece 2: erf(t) ~ p(t - 3),   p of degree 12, on [2, 4.2]
           (centered at 3 — an uncentered fit loses ~3 digits to f32
            cancellation in the Horner evaluation)
  beyond 4.2: erf == +-1 at f32 precision (1 - erf(4.2) ~ 3e-9 < f32 ulp/2)

Run: python tools/fit_gelu_poly.py  — prints coefficients + max errors.
"""
from __future__ import annotations

import numpy as np
from scipy.special import erf


def lawson(A: np.ndarray, y: np.ndarray, iters: int = 400) -> np.ndarray:
    w = np.ones(len(y))
    sol = None
    for _ in range(iters):
        sol = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)[0]
        err = np.abs(A @ sol - y)
        w *= (1e-14 + err) ** 0.5
        w /= w.max()
    return sol


def main():
    t1 = np.linspace(1e-9, 2, 20001)
    A1 = np.vander(t1 * t1, 8, increasing=True) * t1[:, None]
    c1 = lawson(A1, erf(t1))
    print("piece1 (t*q(t^2), [0,2])   max err:", np.abs(A1 @ c1 - erf(t1)).max())
    print(repr(c1))

    t2 = np.linspace(2, 4.2, 20001)
    A2 = np.vander(t2 - 3.0, 13, increasing=True)
    c2 = lawson(A2, erf(t2))
    print("piece2 (p(t-3), [2,4.2])   max err:", np.abs(A2 @ c2 - erf(t2)).max())
    print(repr(c2))

    # f32 Horner end-to-end check
    def horner(c, x):
        p = np.full_like(x, np.float32(c[-1]))
        for cc in c[-2::-1]:
            p = p * x + np.float32(cc)
        return p

    tt = np.linspace(-6, 6, 400001).astype(np.float32)
    ta = np.abs(tt)
    e = np.where(ta < 2, ta * horner(c1, ta * ta),
                 np.where(ta < 4.2,
                          horner(c2, np.minimum(ta, np.float32(4.2))
                                 - np.float32(3.0)), 1.0)) * np.sign(tt)
    print("combined f32 max err:", np.abs(e - erf(tt.astype(np.float64))).max())


if __name__ == "__main__":
    main()
