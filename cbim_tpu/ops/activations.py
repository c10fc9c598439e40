"""Division/exp-free GELU for the bf16 compute path.

The reference uses torch.nn.GELU (exact erf form) everywhere
(model/dim3/utils.py get_act / conv blocks).  XLA's f32 ``erf`` lowering
branches into an erfc/exp evaluation outside |x|<1, and on the VPU the
exp + divide chain makes GELU one of the most expensive elementwise ops in
the step: the round-3 profile showed ~20 ms per full-res activation pass at
(4,128^3,32) vs a ~4 ms bandwidth floor (docs/benchmarks.md).

``fast_gelu`` evaluates erf with a two-piece polynomial (odd minimax
t*q(t^2) on [0,2]; a degree-12 minimax centered at t=3 on [2,4.2]; +-1
beyond), FMA/select only — no exp, no division:

    max |erf - poly|  = 8.1e-7   (f32 Horner, measured over [-6,6])
    max |gelu - exact| = 1.3e-6  (absolute, over [-12,12])

That error is ~1/3000 of a bf16 ulp at |y|~1, so bf16 outputs match the
exact form except within ~1e-6 of a rounding boundary (and in the dead
negative tail |x|>5.6 where the exact value is <1e-15 and the poly returns
-0).  The approximation is therefore gated to bf16 inputs: f32 callers
(parity tests, fp32 islands) keep the exact erf path.

The backward follows by autodiff of the polynomial — also exp-free, with
derivative error of the same order.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT2 = 0.7071067811865476

# minimax fits of erf (tools/fit_gelu_poly.py documents the fit procedure):
# piece 1: erf(t) ~ t * q(t^2) on [0, 2], max err 5.6e-7
_C1 = np.array([
    1.12837431e+00, -3.76065127e-01, 1.12611506e-01, -2.64864707e-02,
    4.87953234e-03, -6.70928450e-04, 6.03762172e-05, -2.59603629e-06],
    np.float32)
# piece 2: erf(t) ~ p(t - 3) on [2, 4.2], max err 2.4e-10 (f32 Horner ~8e-7)
_C2 = np.array([
    9.99977910e-01, 1.39250102e-04, -4.17758862e-04, 7.89173903e-04,
    -1.04441503e-03, 1.01602646e-03, -7.37845113e-04, 3.92151859e-04,
    -1.35606106e-04, 1.16317821e-05, 1.71986772e-05, -9.37452955e-06,
    1.64176448e-06], np.float32)


def _horner(coefs: np.ndarray, x: jax.Array) -> jax.Array:
    p = jnp.full_like(x, float(coefs[-1]))
    for c in coefs[-2::-1]:
        p = p * x + float(c)
    return p


def _erf_poly(t32: jax.Array) -> jax.Array:
    ta = jnp.abs(t32)
    s = ta * ta
    inner = ta * _horner(_C1, s)
    outer = _horner(_C2, jnp.minimum(ta, 4.2) - 3.0)
    e = jnp.where(ta < 2.0, inner, jnp.where(ta < 4.2, outer, 1.0))
    return jnp.sign(t32) * e


def fast_gelu(x: jax.Array) -> jax.Array:
    """Exact-form GELU (0.5*x*(1+erf(x/sqrt(2)))) with erf evaluated by the
    polynomial above when ``x`` is bf16; falls through to jax.nn.gelu
    (XLA erf) for every other dtype.

    OPT-IN (CBIM_FAST_GELU=1): the step-level bench measured the polynomial
    *slower* than XLA erf on v5e (batch-4 flagship step 2.732 vs 2.831
    vols/s/chip, 2026-08-19) — the f32 upcast + two Horner chains cost more
    than the erfc/exp branch XLA fuses into the surrounding ops.  Kept for
    elementwise-bound callers that measure otherwise."""
    if x.dtype != jnp.bfloat16 or os.environ.get("CBIM_FAST_GELU", "0") != "1":
        return jax.nn.gelu(x, approximate=False)
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + _erf_poly(x32 * _INV_SQRT2))
    return y.astype(x.dtype)
