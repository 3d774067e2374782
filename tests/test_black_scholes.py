"""End-to-end Monte-Carlo Black-Scholes pricing test.

Models the reference's MonteCarloBlackScholesModelTest (/root/reference/src/
test/java/net/finmath/cuda/montecarlo/MonteCarloBlackScholesModelTest.java):
Euler MC European call vs analytic Black-Scholes, tolerance 0.005 (:156).
Path count reduced from 1M to 200k for CI speed (MC error scales ~1/sqrt(N);
bench.py runs the full 1M-path configuration on TPU).
"""

import math

import pytest

from finmath_tpu.models.analytic import (
    bachelier_formula,
    black_formula,
    black_implied_volatility,
    black_scholes_option_value,
)
from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    EuropeanOption,
    MonteCarloBlackScholesModel,
    mc_european_call_price,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

# Reference test parameters (MonteCarloBlackScholesModelTest.java:60-75)
S0, R, SIGMA = 1.0, 0.05, 0.30
T, K = 1.0, 1.05
N_PATHS, N_STEPS = 200_000, 100


class TestAnalyticFormulas:
    def test_black_scholes_value(self):
        # standard textbook check: S=100, K=100, r=5%, sigma=20%, T=1 -> 10.4506
        v = black_scholes_option_value(100.0, 0.05, 0.20, 1.0, 100.0)
        assert v == pytest.approx(10.4506, abs=1e-3)

    def test_put_call_parity(self):
        call = black_scholes_option_value(100.0, 0.05, 0.2, 1.0, 90.0, is_call=True)
        put = black_scholes_option_value(100.0, 0.05, 0.2, 1.0, 90.0, is_call=False)
        assert call - put == pytest.approx(100.0 - 90.0 * math.exp(-0.05), abs=1e-9)

    def test_black_implied_vol_roundtrip(self):
        v = black_formula(0.03, 0.03, 0.25, 5.0, payoff_unit=7.5)
        iv = black_implied_volatility(0.03, 0.03, 5.0, v, payoff_unit=7.5)
        assert iv == pytest.approx(0.25, abs=1e-7)

    def test_bachelier_atm_closed_form(self):
        # ATM Bachelier: value = payoffUnit * vol * sqrt(T/(2*pi))
        v = bachelier_formula(0.02, 0.02, 0.005, 4.0, payoff_unit=3.0)
        assert v == pytest.approx(3.0 * 0.005 * math.sqrt(4.0 / (2 * math.pi)), rel=1e-10)


class TestMonteCarloBlackScholes:
    def test_object_api_price_vs_analytic(self):
        td = TimeDiscretization(initial=0.0, num_steps=N_STEPS, step=T / N_STEPS)
        model = BlackScholesModel(S0, R, SIGMA)
        sim = MonteCarloBlackScholesModel(td, N_PATHS, model, seed=3141)
        option = EuropeanOption(T, K)
        mc_value = option.get_value(sim)
        analytic = black_scholes_option_value(S0, R, SIGMA, T, K)
        # ref. tolerance 0.005 at 1M paths (:156); scaled for 200k paths
        assert mc_value == pytest.approx(analytic, abs=0.005)

    def test_fused_kernel_price_vs_analytic(self):
        mc_value = mc_european_call_price(3141, N_PATHS, N_STEPS, S0, R, SIGMA, T, K)
        analytic = black_scholes_option_value(S0, R, SIGMA, T, K)
        assert mc_value == pytest.approx(analytic, abs=0.005)

    def test_fused_kernel_deterministic(self):
        v1 = mc_european_call_price(7, 50_000, 20, S0, R, SIGMA, T, K)
        v2 = mc_european_call_price(7, 50_000, 20, S0, R, SIGMA, T, K)
        assert v1 == v2

    def test_asian_call_below_european(self):
        """Arithmetic-average Asian call must be cheaper than the European
        (the average is less volatile than the terminal price)."""
        from finmath_tpu.models.black_scholes import mc_asian_call_price

        asian = mc_asian_call_price(1, 100_000, 50, S0, R, SIGMA, T, 1.0)
        euro = mc_european_call_price(1, 100_000, 50, S0, R, SIGMA, T, 1.0)
        assert 0 < asian < euro

    def test_martingale_property(self):
        """E[S_T / N_T] must equal S_0 (discounted asset is a martingale)."""
        td = TimeDiscretization(initial=0.0, num_steps=50, step=T / 50)
        model = BlackScholesModel(S0, R, SIGMA)
        sim = MonteCarloBlackScholesModel(td, 200_000, model, seed=99)
        s_t = sim.get_asset_value(T)
        discounted = s_t.div(sim.get_numeraire(T)).mult(sim.get_numeraire(0.0))
        assert discounted.get_average() == pytest.approx(S0, abs=3 * discounted.get_standard_error())
