"""Tests for the generic Fourier pricing layer (models/fourier.py) and
the Variance-Gamma / Bachelier / displaced-lognormal families.

The Fourier layer is cross-validated against every INDEPENDENT oracle
the framework already has (Black-Scholes closed form, the Merton
mixture series, the dedicated Heston P1/P2 pricer) — three models,
three algebraically unrelated derivations, one generic inversion."""

import math

import numpy as np
import pytest

from finmath_tpu.models import HestonParams, MertonParams
from finmath_tpu.models.analytic import (
    bachelier_formula,
    black_scholes_option_value,
)
from finmath_tpu.models.bachelier import (
    BachelierParams,
    DisplacedLognormalParams,
    bachelier_analytic_price,
    bachelier_terminal_std,
    displaced_analytic_price,
    mc_bachelier_european_prices,
    mc_displaced_european_prices,
)
from finmath_tpu.models.fourier import (
    black_scholes_cf,
    european_call_from_cf,
    heston_cf,
    merton_cf,
    variance_gamma_cf,
)
from finmath_tpu.models.heston import heston_characteristic_prices
from finmath_tpu.models.merton import merton_series_prices
from finmath_tpu.models.variance_gamma import (
    VarianceGammaParams,
    calibrate_variance_gamma,
    mc_vg_european_prices,
    vg_analytic_prices,
)

STRIKES = np.array([80.0, 90.0, 100.0, 110.0, 125.0])
T = 1.25


class TestFourierLayer:
    def test_black_scholes_cf_vs_closed_form(self):
        cf = black_scholes_cf(100.0, 0.04, 0.25, T)
        got = european_call_from_cf(cf, 0.04, T, STRIKES)
        want = [black_scholes_option_value(100.0, 0.04, 0.25, T, k)
                for k in STRIKES]
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_merton_cf_vs_mixture_series(self):
        p = MertonParams(100.0, 0.05, 0.2, jump_intensity=0.6,
                         jump_size_mean=-0.15, jump_size_std=0.25)
        got = european_call_from_cf(merton_cf(p, T), 0.05, T, STRIKES)
        want = merton_series_prices(p, T, STRIKES)
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_heston_cf_vs_dedicated_pricer(self):
        p = HestonParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.05,
                         xi=0.6, rho=-0.7)
        got = european_call_from_cf(heston_cf(p, T), 0.03, T, STRIKES)
        want = heston_characteristic_prices(p, T, STRIKES)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_put_call_parity(self):
        cf = black_scholes_cf(100.0, 0.04, 0.25, T)
        c = european_call_from_cf(cf, 0.04, T, STRIKES, is_call=True)
        p = european_call_from_cf(cf, 0.04, T, STRIKES, is_call=False)
        df = math.exp(-0.04 * T)
        np.testing.assert_allclose(c - p, 100.0 - STRIKES * df, rtol=1e-9)

    def test_martingale_assertion_catches_drift_bug(self):
        # a CF with the wrong drift must be rejected loudly
        def bad_cf(u):
            u = np.asarray(u, dtype=np.complex128)
            return np.exp(1j * u * math.log(100.0)
                          - 0.5 * 0.04 * u * u)  # forgot (r - s^2/2)T
        with pytest.raises(ValueError, match="martingale"):
            european_call_from_cf(bad_cf, 0.04, T, [100.0],
                                  initial_value=100.0)
        # and the correct CF passes the same assertion
        european_call_from_cf(black_scholes_cf(100.0, 0.04, 0.25, T),
                              0.04, T, [100.0], initial_value=100.0)


class TestVarianceGamma:
    P = VarianceGammaParams(100.0, 0.04, sigma=0.18, theta=-0.14, nu=0.25)

    def test_admissibility_validation(self):
        with pytest.raises(ValueError, match="inadmissible"):
            VarianceGammaParams(100.0, 0.0, sigma=2.0, theta=0.5, nu=1.0)

    def test_cf_martingale(self):
        cf = variance_gamma_cf(100.0, 0.04, 0.18, -0.14, 0.25, T)
        fwd = cf(np.array([-1j]))[0]
        np.testing.assert_allclose(fwd.real, 100.0 * math.exp(0.04 * T),
                                   rtol=1e-12)
        assert abs(fwd.imag) < 1e-12

    def test_analytic_shape(self):
        c = vg_analytic_prices(self.P, T, STRIKES)
        assert np.all(np.diff(c) < 0) and np.all(c > 0)
        # negative theta skews: OTM put wing fatter than BS at same
        # terminal variance E[X^2] = (sigma^2 + theta^2 nu) T
        var = (self.P.sigma**2 + self.P.theta**2 * self.P.nu)
        bs = black_scholes_option_value(100.0, 0.04, math.sqrt(var), T,
                                        80.0)
        put_vg = vg_analytic_prices(self.P, T, [80.0], is_call=False)[0]
        put_bs = bs - 100.0 + 80.0 * math.exp(-0.04 * T)
        assert put_vg > put_bs

    def test_mc_vs_analytic(self):
        px, fwd = mc_vg_european_prices(self.P, T, STRIKES,
                                        num_paths=400_000, num_steps=8,
                                        antithetic=True, seed=2)
        ref = vg_analytic_prices(self.P, T, STRIKES)
        np.testing.assert_allclose(px, ref, rtol=1.5e-2)
        assert abs(fwd - 100.0) < 0.15

    def test_mc_exact_in_steps(self):
        # exact scheme: 2 steps and 16 steps agree up to MC noise
        k = np.array([100.0])
        ref = vg_analytic_prices(self.P, T, k)[0]
        for steps in (2, 16):
            px, _ = mc_vg_european_prices(self.P, T, k, num_paths=400_000,
                                          num_steps=steps, seed=4,
                                          antithetic=True)
            assert abs(px[0] - ref) / ref < 1.2e-2, (steps, px[0], ref)

    def test_calibration_recovers_surface(self):
        truth = VarianceGammaParams(100.0, 0.02, sigma=0.2, theta=-0.1,
                                    nu=0.3)
        mats = [0.5, 1.0, 2.0]
        ks = [[90.0, 100.0, 110.0]] * 3
        targets = [vg_analytic_prices(truth, t, k)
                   for t, k in zip(mats, ks)]
        res = calibrate_variance_gamma(100.0, 0.02, mats, ks, targets)
        assert res.rms_price_error < 1e-6
        assert abs(res.params.sigma - 0.2) < 2e-3
        assert abs(res.params.theta + 0.1) < 2e-2


class TestBachelier:
    P = BachelierParams(100.0, 0.03, volatility=15.0)

    def test_terminal_std_r_to_zero_limit(self):
        p0 = BachelierParams(100.0, 0.0, volatility=15.0)
        p_eps = BachelierParams(100.0, 1e-9, volatility=15.0)
        np.testing.assert_allclose(bachelier_terminal_std(p0, 2.0),
                                   15.0 * math.sqrt(2.0), rtol=1e-12)
        np.testing.assert_allclose(bachelier_terminal_std(p_eps, 2.0),
                                   bachelier_terminal_std(p0, 2.0),
                                   rtol=1e-7)

    def test_negative_strikes_priced(self):
        ks = np.array([-50.0, 0.1, 100.0])
        c = bachelier_analytic_price(self.P, T, ks)
        assert np.all(np.diff(c) < 0) and np.all(c > 0)
        df = math.exp(-0.03 * T)
        fwd = 100.0 * math.exp(0.03 * T)
        # deep-ITM call ~ discounted intrinsic
        assert abs(c[0] - df * (fwd + 50.0)) < 0.2

    def test_mc_vs_analytic(self):
        ks = np.array([-20.0, 80.0, 100.0, 120.0])
        px, fwd = mc_bachelier_european_prices(self.P, T, ks,
                                               num_paths=400_000,
                                               antithetic=True, seed=6)
        ref = bachelier_analytic_price(self.P, T, ks)
        np.testing.assert_allclose(px, ref, atol=0.05)
        assert abs(fwd * math.exp(0.03 * T) - 100.0 * math.exp(0.03 * T)) \
            < 0.1

    def test_put_call_parity(self):
        c = bachelier_analytic_price(self.P, T, [95.0], is_call=True)[0]
        p = bachelier_analytic_price(self.P, T, [95.0], is_call=False)[0]
        df = math.exp(-0.03 * T)
        fwd = 100.0 * math.exp(0.03 * T)
        np.testing.assert_allclose(c - p, df * (fwd - 95.0), rtol=1e-10)


class TestDisplacedLognormal:
    def test_zero_displacement_is_black_scholes(self):
        p = DisplacedLognormalParams(100.0, 0.04, 0.25, displacement=1e-9)
        got = displaced_analytic_price(p, T, STRIKES)
        want = [black_scholes_option_value(100.0, 0.04, 0.25, T, k)
                for k in STRIKES]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_large_displacement_approaches_bachelier(self):
        d = 1e5
        sig_n = 12.0                         # target normal vol
        p = DisplacedLognormalParams(100.0, 0.0, sig_n / d, displacement=d)
        got = displaced_analytic_price(p, 1.0, [100.0])[0]
        want = bachelier_formula(100.0, 100.0, sig_n, 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_mc_vs_analytic(self):
        p = DisplacedLognormalParams(100.0, 0.03, 0.2, displacement=30.0)
        px, fwd = mc_displaced_european_prices(p, T, STRIKES,
                                               num_paths=400_000,
                                               antithetic=True, seed=8)
        ref = displaced_analytic_price(p, T, STRIKES)
        np.testing.assert_allclose(px, ref, rtol=6e-3)
        assert abs(fwd - 100.0) < 0.1

    def test_strike_below_shift_raises(self):
        p = DisplacedLognormalParams(100.0, 0.0, 0.2, displacement=10.0)
        with pytest.raises(ValueError, match="displacement"):
            displaced_analytic_price(p, T, [-20.0])

    def test_validation(self):
        with pytest.raises(ValueError, match="positive"):
            DisplacedLognormalParams(10.0, 0.0, 0.2, displacement=-20.0)
