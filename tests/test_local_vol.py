"""Dupire local-volatility tests (finmath_tpu/models/local_vol.py).

The model's defining property IS its strongest test: simulating under
the Dupire local variance extracted from an implied surface must
REPRICE that surface. With a strike-flat SSVI (eta = 0) the oracle is
exact (Black-Scholes with the integrated term variance); with skew on,
the Black-inverted MC vanillas must return the SSVI smile within the
MC + Euler-discretization error. The autodiff identity
v_loc(flat) == theta'(t) pins the nested-jvp Dupire derivatives."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.analytic import (
    black_implied_volatility,
    black_scholes_option_value,
)
from finmath_tpu.models.local_vol import (
    DupireLocalVolSurface,
    LocalVolatilityModel,
    MonteCarloLocalVolModel,
    SSVISurface,
    european_call_values,
    local_variance,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R = 100.0, 0.03
SURF = SSVISurface(sigma0=0.22, sigma_inf=0.20, tau=2.0, rho=-0.65,
                   eta=0.6, gamma=0.4)
FLAT = SSVISurface(sigma0=0.28, sigma_inf=0.18, tau=1.5, rho=0.0, eta=0.0)


class TestSurface:
    def test_flat_total_variance_is_theta(self):
        k = jnp.linspace(-1.5, 1.5, 7)
        w = FLAT.total_variance(k, jnp.asarray(2.0))
        th = FLAT.theta(2.0)
        np.testing.assert_allclose(np.asarray(w), float(th), rtol=1e-12)

    def test_backbone_limits(self):
        # short end: theta ~ sigma0^2 t; long end slope -> sigma_inf^2
        t = 1e-5
        assert abs(float(FLAT.theta(t)) / t - 0.28**2) < 1e-3
        slope = float(FLAT.theta(30.0) - FLAT.theta(29.0))
        assert abs(slope - 0.18**2) < 1e-6

    def test_validate(self):
        SURF.validate(10.0)
        with pytest.raises(ValueError):
            SSVISurface(0.2, 0.2, 1.0, -0.9, 8.0).validate(10.0)

    def test_param_validation(self):
        with pytest.raises(ValueError):
            SSVISurface(0.2, 0.2, 1.0, 1.5, 0.1)
        with pytest.raises(ValueError):
            SSVISurface(-0.2, 0.2, 1.0, 0.0, 0.1)
        with pytest.raises(ValueError):
            SSVISurface(0.2, 0.2, -1.0, 0.0, 0.1)


class TestDupireFormula:
    def test_flat_local_variance_is_theta_prime(self):
        k = jnp.linspace(-1.0, 1.0, 9)
        for t in (0.3, 1.0, 4.0):
            v = np.asarray(local_variance(FLAT, k, jnp.asarray(t)))
            th_p = float(jax.grad(FLAT.theta)(t))
            np.testing.assert_allclose(v, th_p, rtol=1e-6)

    def test_skewed_positive_and_finite(self):
        k = jnp.linspace(-1.2, 1.2, 41)
        for t in (0.1, 0.5, 1.0, 3.0, 8.0):
            v = np.asarray(local_variance(SURF, k, jnp.asarray(t)))
            assert np.all(np.isfinite(v)) and np.all(v > 0.0)

    def test_custom_surface_adapter(self):
        # w = sigma^2 t exactly: local variance == sigma^2 everywhere
        custom = DupireLocalVolSurface(w=lambda k, t: 0.04 * t + 0.0 * k)
        v = np.asarray(local_variance(custom, jnp.linspace(-1, 1, 5),
                                      jnp.asarray(0.7)))
        np.testing.assert_allclose(v, 0.04, rtol=1e-7)


@pytest.fixture(scope="module")
def flat_mc():
    td = TimeDiscretization(initial=0.0, num_steps=50, step=0.02)
    model = LocalVolatilityModel(S0, R, FLAT, td)
    return MonteCarloLocalVolModel(td, 200_000, model, seed=11)


@pytest.fixture(scope="module")
def skew_mc():
    td = TimeDiscretization(initial=0.0, num_steps=100, step=0.01)
    model = LocalVolatilityModel(S0, R, SURF, td)
    return MonteCarloLocalVolModel(td, 200_000, model, seed=12)


class TestFlatOracle:
    def test_mc_matches_term_vol_black_scholes(self, flat_mc):
        out = european_call_values(flat_mc, [80.0, 100.0, 125.0], [1.0])
        sig_term = math.sqrt(float(FLAT.theta(1.0)) / 1.0)
        for j, strike in enumerate([80.0, 100.0, 125.0]):
            v, e = out[0, j]
            an = black_scholes_option_value(S0, R, sig_term, 1.0, strike)
            assert abs(v - an) < 4 * e + 1e-3 * an


class TestSurfaceRoundTrip:
    def test_mc_reprices_the_smile(self, skew_mc):
        strikes = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
        out = european_call_values(skew_mc, strikes, [1.0])
        fwd = S0 * math.exp(R * 1.0)
        df = math.exp(-R * 1.0)
        for j, kk in enumerate(strikes):
            v = out[0, j, 0]
            iv_mc = black_implied_volatility(fwd, kk, 1.0, v / df)
            iv_in = float(SURF.implied_volatility(
                jnp.asarray(math.log(kk / fwd)), jnp.asarray(1.0)))
            # MC noise at 200k paths + first-order Euler weak bias
            assert abs(iv_mc - iv_in) < 0.004, (kk, iv_mc, iv_in)

    def test_skew_sign(self, skew_mc):
        # rho < 0: downside implied vol above upside
        strikes = np.array([85.0, 115.0])
        out = european_call_values(skew_mc, strikes, [1.0])
        fwd = S0 * math.exp(R * 1.0)
        df = math.exp(-R * 1.0)
        iv_dn = black_implied_volatility(fwd, 85.0, 1.0, out[0, 0, 0] / df)
        iv_up = black_implied_volatility(fwd, 115.0, 1.0, out[0, 1, 0] / df)
        assert iv_dn > iv_up + 0.01


class TestFacadeIntegration:
    def test_product_zoo_runs_under_local_vol(self, skew_mc):
        from finmath_tpu.models.equity_products import (
            AsianOption,
            DigitalOption,
        )
        dig, dig_e = DigitalOption(1.0, 100.0).get_value_and_error(skew_mc)
        assert 0.2 < dig < 0.8
        asian, _ = AsianOption([0.25, 0.5, 0.75, 1.0], 100.0) \
            .get_value_and_error(skew_mc)
        eur = european_call_values(skew_mc, [100.0], [1.0])[0, 0, 0]
        assert 0.0 < asian < eur  # averaging reduces optionality

    def test_numeraire_and_paths(self, flat_mc):
        n = flat_mc.get_numeraire(1.0)
        assert n.is_deterministic()
        assert abs(n.get_average() - math.exp(R)) < 1e-12
        s = flat_mc.get_asset_value(1.0)
        mean = s.get_average()
        assert abs(mean - S0 * math.exp(R)) < 0.5  # martingale drift


class TestComposability:
    def test_american_ls_over_local_vol_facade(self, flat_mc):
        """The American LS engine composes with the local-vol facade:
        the American put dominates the European and, with a flat
        surface, stays within a few sigma of the CRR American price at
        the term vol."""
        from finmath_tpu.models.american import BermudanOption, crr_american_price
        from finmath_tpu.models.analytic import black_scholes_option_value

        mc = flat_mc
        sig_term = math.sqrt(float(FLAT.theta(1.0)) / 1.0)
        ex = [0.1 * i for i in range(1, 11)]  # on the 0.02 grid
        am = BermudanOption(ex, 100.0, is_call=False)
        v, e = am.get_value_and_error(mc)
        eur = black_scholes_option_value(S0, R, sig_term, 1.0, 100.0,
                                         is_call=False)
        assert v > eur - 4 * e
        crr = crr_american_price(S0, R, sig_term, 1.0, 100.0,
                                 is_call=False, num_steps=2000)
        assert abs(v - crr) < 4 * e + 0.01 * crr
