"""Structured product tests (finmath_tpu/models/structured_products.py):
MC vs the Rubinstein / cliquet-decomposition / Geske / chooser-parity
closed forms, plus cross-model runs and degeneration identities."""

import math

import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    EuropeanOption,
    MonteCarloBlackScholesModel,
)
from finmath_tpu.models.heston import HestonParams, MonteCarloHestonModel
from finmath_tpu.models.structured_products import (
    ChooserOption,
    CliquetOption,
    CompoundOption,
    ForwardStartOption,
    chooser_option_value,
    cliquet_option_value,
    compound_option_value,
    forward_start_option_value,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N_PATHS = 200_000


@pytest.fixture(scope="module")
def sim():
    td = TimeDiscretization(initial=0.0, num_steps=50, step=T / 50)
    return MonteCarloBlackScholesModel(td, N_PATHS,
                                       BlackScholesModel(S0, R, SIG),
                                       seed=21)


class TestForwardStart:
    @pytest.mark.parametrize("k,call", [(1.0, True), (1.1, True),
                                        (0.95, False)])
    def test_matches_rubinstein(self, sim, k, call):
        v, e = ForwardStartOption(0.4, T, k, is_call=call) \
            .get_value_and_error(sim)
        an = forward_start_option_value(S0, R, SIG, 0.4, T, k, call)
        assert abs(v - an) < 4 * e

    def test_start_at_zero_limit_is_european(self):
        # start_time -> 0: strike ~ moneyness * S0
        an = forward_start_option_value(S0, R, SIG, 1e-9, T, 1.05)
        bs = black_scholes_option_value(S0, R, SIG, T, 1.05 * S0)
        assert abs(an - bs) < 1e-4 * bs

    def test_validation(self):
        with pytest.raises(ValueError):
            ForwardStartOption(0.0, T)
        with pytest.raises(ValueError):
            forward_start_option_value(S0, R, SIG, T, T, 1.0)


class TestCliquet:
    TIMES = [0.2, 0.4, 0.6, 0.8, 1.0]

    def test_matches_decomposition(self, sim):
        v, e = CliquetOption(self.TIMES, floor=-0.05, cap=0.08) \
            .get_value_and_error(sim)
        an = cliquet_option_value(R, SIG, self.TIMES, -0.05, 0.08)
        assert abs(v - an) < 4 * e

    def test_uncollared_is_sum_of_forwards(self, sim):
        # floor=-inf, cap=inf: payoff = sum(ratio - 1), value =
        # df * sum(e^{r dt} - 1)
        v, e = CliquetOption(self.TIMES, floor=-np.inf, cap=np.inf) \
            .get_value_and_error(sim)
        an = math.exp(-R * T) * sum(
            math.exp(R * 0.2) - 1.0 for _ in self.TIMES)
        assert abs(v - an) < 4 * e

    def test_tight_collar_is_deterministic(self, sim):
        v, e = CliquetOption(self.TIMES, floor=0.01, cap=0.01) \
            .get_value_and_error(sim)
        an = math.exp(-R * T) * 0.01 * len(self.TIMES)
        assert abs(v - an) < 1e-7 and e < 1e-9   # f32 clip rounding

    def test_cap_reduces_value(self, sim):
        hi, _ = CliquetOption(self.TIMES, -0.05, np.inf) \
            .get_value_and_error(sim)
        lo, _ = CliquetOption(self.TIMES, -0.05, 0.05) \
            .get_value_and_error(sim)
        assert lo < hi

    def test_heston_facade_runs(self):
        td = TimeDiscretization(initial=0.0, num_steps=20, step=T / 20)
        m = MonteCarloHestonModel(
            td, 50_000,
            HestonParams(S0, R, v0=0.04, kappa=1.5, theta=0.05, xi=0.4,
                         rho=-0.6), seed=5)
        v, e = CliquetOption([0.25, 0.5, 0.75, 1.0], -0.05, 0.08) \
            .get_value_and_error(m)
        assert np.isfinite(v) and e < 0.01

    def test_validation(self):
        with pytest.raises(ValueError):
            CliquetOption([0.5, 0.25], -0.1, 0.1)
        with pytest.raises(ValueError):
            CliquetOption([0.5], 0.2, 0.1)


class TestCompound:
    def test_matches_geske(self, sim):
        v, e = CompoundOption(0.5, 5.0, T, 100.0).get_value_and_error(sim)
        an = compound_option_value(S0, R, SIG, 0.5, 5.0, T, 100.0)
        assert abs(v - an) < 4 * e

    def test_zero_outer_strike_is_inner_option(self, sim):
        v, e = CompoundOption(0.5, 0.0, T, 100.0).get_value_and_error(sim)
        # paying 0 at t1 for the option == owning the option
        an = black_scholes_option_value(S0, R, SIG, T, 100.0)
        assert abs(v - an) < 4 * e + 2e-3 * an

    def test_geske_zero_outer_strike_limit(self):
        an = compound_option_value(S0, R, SIG, 0.5, 1e-12, T, 100.0)
        bs = black_scholes_option_value(S0, R, SIG, T, 100.0)
        assert abs(an - bs) < 1e-6 * bs

    def test_needs_bs_facade(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        m = MonteCarloHestonModel(
            td, 1_000, HestonParams(S0, R, v0=0.04, kappa=1.5,
                                    theta=0.05, xi=0.4, rho=-0.6))
        with pytest.raises(NotImplementedError):
            CompoundOption(0.5, 5.0, T, 100.0).get_value(m)


class TestChooser:
    def test_matches_parity_closed_form(self, sim):
        v, e = ChooserOption(0.5, T, 100.0).get_value_and_error(sim)
        an = chooser_option_value(S0, R, SIG, 0.5, T, 100.0)
        assert abs(v - an) < 4 * e + 1e-3 * an

    def test_dominates_call_and_put(self, sim):
        v, _ = ChooserOption(0.5, T, 100.0).get_value_and_error(sim)
        c = black_scholes_option_value(S0, R, SIG, T, 100.0)
        p = black_scholes_option_value(S0, R, SIG, T, 100.0,
                                       is_call=False)
        assert v > max(c, p) - 1e-6

    def test_late_choice_approaches_straddle(self):
        # t1 -> T: chooser -> call + put (the straddle)
        an = chooser_option_value(S0, R, SIG, T - 1e-7, T, 100.0)
        straddle = (black_scholes_option_value(S0, R, SIG, T, 100.0)
                    + black_scholes_option_value(S0, R, SIG, T, 100.0,
                                                 is_call=False))
        assert abs(an - straddle) < 1e-3

    def test_validation(self):
        with pytest.raises(ValueError):
            ChooserOption(T, T, 100.0)
