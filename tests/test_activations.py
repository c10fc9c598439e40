"""fast_gelu (polynomial-erf GELU for bf16) accuracy tests.

The polynomial path is opt-in (measured slower at step level on v5e,
docs/benchmarks.md round-3 sweep); force it on here to test its accuracy.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.ops.activations import fast_gelu, _erf_poly


@pytest.fixture(autouse=True)
def _force_fast_gelu(monkeypatch):
    # the gate is read at call time, so a per-test env patch suffices
    monkeypatch.setenv("CBIM_FAST_GELU", "1")


def test_f32_path_is_exact_gelu():
    """Non-bf16 inputs must take the stock exact-erf path bit-for-bit."""
    x = jnp.asarray(np.random.RandomState(0).randn(4096).astype(np.float32) * 5)
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)))


def test_erf_poly_accuracy():
    from scipy.special import erf as erf_ref
    t = jnp.asarray(np.linspace(-8, 8, 100001, dtype=np.float32))
    got = np.asarray(_erf_poly(t), np.float64)
    want = erf_ref(np.asarray(t, np.float64))
    assert np.abs(got - want).max() < 2e-6


def test_bf16_matches_exact_within_one_ulp():
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.concatenate([rng.randn(100000) * 3,
                                    np.linspace(-6, 6, 10000)])
                    .astype(np.float32), jnp.bfloat16)
    fast = np.asarray(fast_gelu(x), np.float32)
    exact = np.asarray(
        jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        .astype(jnp.bfloat16), np.float32)
    # disagreements are single-ulp rounding-boundary flips (the ~1.3e-6 poly
    # error against a bf16 grid), plus the dead tail x < -5.6 where the
    # exact value is < 1e-15 and the poly returns -0.  Assert <= 1 ulp
    # everywhere via the bf16 bit lattice (monotone within a sign for
    # same-sign finite values).
    fb = np.asarray(fast_gelu(x)).view(np.uint16).astype(np.int64)
    eb = np.asarray(
        jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        .astype(jnp.bfloat16)).view(np.uint16).astype(np.int64)

    def lattice(b):
        # map bf16 bits to a signed, monotone integer line
        sign = b >> 15
        mag = b & 0x7FFF
        return np.where(sign == 1, -mag, mag)

    ulp = np.abs(lattice(fb) - lattice(eb))
    d = np.abs(fast - exact)
    # every disagreement is either a 1-ulp boundary flip or absolutely
    # negligible (|y| ~< 1e-5 in the negative tail, where the fixed ~1e-6
    # poly error spans many tiny-value ulps)
    assert np.all((ulp <= 1) | (d < 1e-5)), d[ulp > 1].max()
    assert d.max() < 1e-3, d.max()


def test_gradient_matches_exact():
    x = jnp.asarray(np.linspace(-6, 6, 20001, dtype=np.float32), jnp.bfloat16)
    g_fast = jax.grad(lambda v: fast_gelu(v).astype(jnp.float32).sum())(x)
    g_exact = jax.grad(
        lambda v: jax.nn.gelu(v.astype(jnp.float32),
                              approximate=False).sum())(x)
    d = np.abs(np.asarray(g_fast, np.float32) - np.asarray(g_exact, np.float32))
    assert d.max() < 0.02, d.max()   # bf16 grad quantization dominates
