"""SABR smile model tests (finmath_tpu/models/sabr.py): Hagan
expansions vs their exact degenerations, MC simulator vs the expansion
in its accuracy regime, martingale property, and calibration
round-trips in both quote conventions."""

import math

import numpy as np
import pytest

from finmath_tpu.models.sabr import (
    SABRParams,
    calibrate_sabr,
    jnp_sabr_lognormal_implied_volatility,
    mc_sabr_implied_vols,
    mc_sabr_option_prices,
    sabr_lognormal_implied_volatility,
    sabr_normal_implied_volatility,
)

F, T = 0.03, 2.0
KS = np.array([0.015, 0.02, 0.025, 0.03, 0.04, 0.05])
P = SABRParams(alpha=0.035, beta=0.5, rho=-0.3, nu=0.4)


class TestHaganExpansion:
    def test_beta_one_nu_zero_is_flat_black(self):
        p = SABRParams(alpha=0.25, beta=1.0, rho=0.0, nu=0.0)
        for k in KS:
            assert abs(sabr_lognormal_implied_volatility(p, F, k, T)
                       - 0.25) < 1e-12

    def test_beta_zero_nu_zero_is_flat_normal(self):
        p = SABRParams(alpha=0.01, beta=0.0, rho=0.0, nu=0.0)
        for k in KS:
            assert abs(sabr_normal_implied_volatility(p, F, k, T)
                       - 0.01) < 1e-10

    def test_jnp_twin_matches_host(self):
        import jax.numpy as jnp
        host = np.array([sabr_lognormal_implied_volatility(P, F, k, T)
                         for k in KS])
        twin = np.asarray(jnp_sabr_lognormal_implied_volatility(
            P.alpha, P.beta, P.rho, P.nu, F, jnp.asarray(KS), T))
        assert np.abs(host - twin).max() < 1e-12

    def test_jnp_twin_atm_branch_finite_gradient(self):
        import jax
        import jax.numpy as jnp
        g = jax.grad(lambda a: jnp_sabr_lognormal_implied_volatility(
            a, 0.5, -0.3, 0.4, F, jnp.asarray(F), T))(0.035)
        assert np.isfinite(float(g)) and float(g) > 0.0

    def test_negative_rho_skews_down(self):
        # rho < 0: low strikes get HIGHER lognormal vol (the equity
        # skew shape)
        lo = sabr_lognormal_implied_volatility(P, F, 0.02, T)
        hi = sabr_lognormal_implied_volatility(P, F, 0.045, T)
        atm = sabr_lognormal_implied_volatility(P, F, F, T)
        assert lo > atm

    def test_displacement_shifts_both(self):
        pd = SABRParams(alpha=P.alpha, beta=P.beta, rho=P.rho, nu=P.nu,
                        displacement=0.02)
        v1 = sabr_lognormal_implied_volatility(pd, F, 0.02, T)
        v2 = sabr_lognormal_implied_volatility(
            SABRParams(P.alpha, P.beta, P.rho, P.nu), F + 0.02,
            0.02 + 0.02, T)
        assert abs(v1 - v2) < 1e-14

    def test_param_validation(self):
        with pytest.raises(ValueError):
            SABRParams(alpha=0.03, beta=1.5, rho=0.0, nu=0.3)
        with pytest.raises(ValueError):
            SABRParams(alpha=0.03, beta=0.5, rho=1.0, nu=0.3)
        with pytest.raises(ValueError):
            SABRParams(alpha=-0.1, beta=0.5, rho=0.0, nu=0.3)
        with pytest.raises(ValueError):
            SABRParams(alpha=0.03, beta=0.5, rho=0.0, nu=0.3,
                       displacement=-0.01)


class TestMonteCarlo:
    def test_martingale(self):
        _, fwd = mc_sabr_option_prices(P, F, T, KS, num_paths=200_000,
                                       num_steps=32, seed=3)
        assert abs(fwd - F) < 3e-4

    def test_implied_smile_matches_hagan_near_atm(self):
        # the expansion's own accuracy regime: near-ATM strikes at a
        # moderate smile; wings differ by O(expansions) ~ tens of bp
        ks = np.array([0.025, 0.03, 0.035])
        mc = mc_sabr_implied_vols(P, F, T, ks, num_paths=200_000,
                                  num_steps=64, seed=5)
        hagan = np.array([sabr_lognormal_implied_volatility(P, F, k, T)
                          for k in ks])
        assert np.abs(mc - hagan).max() < 0.006     # vol points

    def test_normal_quote_convention(self):
        ks = np.array([0.028, 0.03, 0.032])
        mc = mc_sabr_implied_vols(P, F, T, ks, quote_type="normal",
                                  num_paths=200_000, num_steps=64,
                                  seed=5)
        hagan = np.array([sabr_normal_implied_volatility(P, F, k, T)
                          for k in ks])
        assert np.abs(mc - hagan).max() < 3e-4      # normal vol units

    def test_prices_monotone_in_strike(self):
        prices, _ = mc_sabr_option_prices(P, F, T, KS,
                                          num_paths=100_000,
                                          num_steps=32, seed=7)
        assert np.all(np.diff(prices) < 0.0)


class TestCalibration:
    def test_lognormal_round_trip(self):
        target = np.array([sabr_lognormal_implied_volatility(P, F, k, T)
                           for k in KS])
        fit = calibrate_sabr(F, T, KS, target, beta=0.5)
        assert fit.converged or fit.rms_vol_error < 1e-8
        assert abs(fit.params.alpha - P.alpha) < 1e-5
        assert abs(fit.params.rho - P.rho) < 1e-4
        assert abs(fit.params.nu - P.nu) < 1e-4

    def test_normal_displaced_round_trip(self):
        pd = SABRParams(alpha=0.03, beta=0.5, rho=0.2, nu=0.3,
                        displacement=0.01)
        target = np.array([sabr_normal_implied_volatility(pd, F, k, T)
                           for k in KS])
        fit = calibrate_sabr(F, T, KS, target, quote_type="normal",
                             beta=0.5, displacement=0.01)
        assert fit.rms_vol_error < 1e-8

    def test_validation(self):
        with pytest.raises(ValueError):
            calibrate_sabr(F, T, KS, np.ones_like(KS),
                           quote_type="mid")
        with pytest.raises(ValueError):
            calibrate_sabr(F, T, KS[:2], np.ones(2))
