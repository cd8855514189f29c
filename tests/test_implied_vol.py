"""Tests: batched BS implied vol (numerics/implied_vol.py) — roundtrip,
edge clamps, implicit-function gradients, and the Heston-smile workflow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import (
    HestonParams,
    black_scholes_call,
    bs_vega,
    heston_call_price,
    implied_vol,
)


def test_roundtrip_batched():
    """price -> IV -> price must close to float tolerance over a grid of
    (S, K, T, sigma) combinations, in ONE vmapped/jitted call."""
    rng = np.random.default_rng(0)
    n = 256
    S = rng.uniform(0.5, 2.0, n).astype(np.float32)
    K = rng.uniform(0.5, 2.0, n).astype(np.float32)
    T = rng.uniform(0.1, 3.0, n).astype(np.float32)
    sig = rng.uniform(0.05, 1.5, n).astype(np.float32)
    r = 0.03
    # elementwise sigma: vmap the scalar-sigma pricer
    price = jax.vmap(lambda s, k, t, v: black_scholes_call(s, k, t, r, v))(
        S, K, T, sig
    )
    # exclude quotes at intrinsic to f32 precision (vega ~ 0: the IV is
    # genuinely unrecoverable from the price; the solver clamps to lo there
    # by design — covered in test_edge_clamps_no_nans)
    intrinsic = np.maximum(S - K * np.exp(-r * T), 0.0)
    ok = (np.asarray(price) - intrinsic) > 1e-4
    assert ok.sum() > 200  # the filter removes only a handful
    iv = jax.jit(implied_vol)(price, S, K, T, jnp.full_like(S, r))
    np.testing.assert_allclose(np.asarray(iv)[ok], sig[ok],
                               rtol=2e-3, atol=2e-4)


def test_edge_clamps_no_nans():
    """At-or-below intrinsic -> lo clamp; absurdly high price -> hi clamp;
    never NaN."""
    iv_low = implied_vol(0.0, 1.0, 1.0, 1.0, 0.0)       # price == intrinsic
    iv_deep = implied_vol(0.05, 1.5, 1.0, 1.0, 0.0)     # below intrinsic 0.5
    iv_high = implied_vol(0.999, 1.0, 1.0, 1.0, 0.0)    # near S: sigma -> inf
    assert float(iv_low) == pytest.approx(1e-4, abs=2e-3)
    assert float(iv_deep) == pytest.approx(1e-4, abs=2e-3)
    assert float(iv_high) > 4.0
    assert np.isfinite([iv_low, iv_deep, iv_high]).all()


def test_gradient_is_inverse_vega():
    """Implicit-function VJP: d(IV)/d(price) must equal 1/vega at the root."""
    S, K, T, r, sig = 1.0, 1.05, 0.7, 0.02, 0.35
    price = float(black_scholes_call(S, K, T, r, sig))
    g = jax.grad(lambda p: implied_vol(p, S, K, T, r))(price)
    vega = float(bs_vega(S, K, T, r, sig))
    assert float(g) == pytest.approx(1.0 / vega, rel=1e-3)


def test_gradient_wrt_strike_matches_finite_difference():
    S, T, r, sig = 1.0, 1.0, 0.05, 0.4
    price = float(black_scholes_call(S, 1.0, T, r, sig))

    def iv_of_K(K):
        return implied_vol(price, S, K, T, r)

    g = float(jax.grad(iv_of_K)(1.0))
    eps = 1e-3
    fd = (float(iv_of_K(1.0 + eps)) - float(iv_of_K(1.0 - eps))) / (2 * eps)
    assert g == pytest.approx(fd, rel=5e-3)


def test_heston_smile_has_the_right_shape():
    """Workflow test: Heston prices -> BS implied-vol smile. With the
    reference's big positive rho (0.8) the call-wing IV must exceed the
    put-wing IV (positive skew); level anchored near sqrt(v0)."""
    hp = HestonParams()
    Ks = np.asarray([0.8, 0.9, 1.0, 1.1, 1.2], np.float32)
    prices = np.asarray([
        float(heston_call_price(1.0, hp.v0, HestonParams(
            K=float(k), r=hp.r, T=hp.T, kappa=hp.kappa, theta=hp.theta,
            sigma=hp.sigma, rho=hp.rho, v0=hp.v0)))
        for k in Ks
    ])
    ivs = np.asarray(implied_vol(prices, 1.0, Ks, hp.T, hp.r))
    assert np.all(np.isfinite(ivs)) and np.all(ivs > 0.2)
    assert ivs[-1] > ivs[0]  # rho > 0: upside wing richer
    assert abs(ivs[2] - np.sqrt(hp.v0)) < 0.05  # ATM near sqrt(v0)


def test_gradient_broadcast_shapes_reduce_to_primal():
    """ADVICE r3 (medium): with heterogeneous argument shapes (scalar T,
    array prices) the VJP must reduce cotangents over broadcast axes —
    grad w.r.t. a scalar must be a scalar equal to the sum of the
    per-element sensitivities (checked against central finite differences
    in f64 NumPy via the f32 primal)."""
    r = 0.02
    S = jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    K = 1.0
    sig_true = np.array([0.4, 0.3, 0.35], np.float32)
    T0 = 0.8
    prices = jax.vmap(lambda s, v: black_scholes_call(s, K, T0, r, v))(
        S, jnp.asarray(sig_true)
    )

    def f(T):
        return jnp.sum(implied_vol(prices, S, K, T, r))

    g = jax.grad(f)(T0)
    assert jnp.shape(g) == ()  # scalar primal -> scalar cotangent
    eps = 1e-3
    fd = (float(f(T0 + eps)) - float(f(T0 - eps))) / (2 * eps)
    assert float(g) == pytest.approx(fd, rel=5e-3, abs=5e-4)

    # And the array-arg gradient stays per-element (unchanged behavior).
    gS = jax.grad(lambda s: jnp.sum(implied_vol(prices, s, K, T0, r)))(S)
    assert gS.shape == S.shape
