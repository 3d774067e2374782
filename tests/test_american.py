"""Longstaff-Schwartz American/Bermudan equity option tests
(finmath_tpu/models/american.py) — validated against the independent
CRR binomial oracle and against no-arbitrage identities."""

import math

import numpy as np
import pytest

from finmath_tpu.models.american import (
    BermudanOption,
    crr_american_price,
)
from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    EuropeanOption,
    MonteCarloBlackScholesModel,
)
from finmath_tpu.models.merton import MertonParams, MonteCarloMertonModel
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, SIG, T, K = 100.0, 0.05, 0.3, 1.0, 110.0
N_PATHS = 200_000
N_EX = 50                                        # dense exercise grid


@pytest.fixture(scope="module")
def bs_sim():
    td = TimeDiscretization(initial=0.0, num_steps=N_EX, step=T / N_EX)
    return MonteCarloBlackScholesModel(td, N_PATHS,
                                       BlackScholesModel(S0, R, SIG),
                                       seed=123)


@pytest.fixture(scope="module")
def ex_times():
    return [i * T / N_EX for i in range(1, N_EX + 1)]


class TestCRROracle:
    def test_european_limit_matches_black_scholes(self):
        # a European-only CRR (no early exercise) is not exposed; check
        # the American CALL equals European BS (no dividends -> never
        # optimal to exercise early)
        crr = crr_american_price(S0, R, SIG, T, K, is_call=True)
        bs = black_scholes_option_value(S0, R, SIG, T, K)
        assert abs(crr - bs) / bs < 1e-3

    def test_put_above_european(self):
        crr = crr_american_price(S0, R, SIG, T, K, is_call=False)
        eur = (black_scholes_option_value(S0, R, SIG, T, K)
               - S0 + K * math.exp(-R * T))
        assert crr > eur
        assert crr >= K - S0                      # above intrinsic


class TestLongstaffSchwartz:
    def test_american_put_matches_crr(self, bs_sim, ex_times):
        opt = BermudanOption(ex_times, K, is_call=False)
        v, err = opt.get_value_and_error(bs_sim)
        crr = crr_american_price(S0, R, SIG, T, K, is_call=False)
        # LS on a dense grid is a LOWER bound up to MC error; with the
        # out-of-sample split it must sit within a few stderr below CRR
        assert v < crr + 3 * err, (v, err, crr)
        assert v > crr - max(5 * err, 0.015 * crr), (v, err, crr)

    def test_american_call_no_dividends_equals_european(self, bs_sim,
                                                        ex_times):
        opt = BermudanOption(ex_times, K, is_call=True)
        v, err = opt.get_value_and_error(bs_sim)
        eur = EuropeanOption(T, K, is_call=True).get_value(bs_sim)
        assert abs(v - eur) < max(4 * err, 0.01 * eur)

    def test_single_exercise_date_is_european(self, bs_sim):
        # insample mode values ALL paths, so one exercise date is the
        # European payoff on the identical paths — an identity
        opt = BermudanOption([T], K, is_call=False,
                             foresight_bias="insample")
        v, _ = opt.get_value_and_error(bs_sim)
        eur = EuropeanOption(T, K, is_call=False).get_value(bs_sim)
        np.testing.assert_allclose(v, eur, rtol=1e-6)

    def test_more_exercise_dates_worth_more(self, bs_sim):
        few = BermudanOption([0.5, 1.0], K, is_call=False,
                             foresight_bias="insample")
        many = BermudanOption([0.26, 0.5, 0.76, 1.0], K, is_call=False,
                              foresight_bias="insample")
        v_few, e1 = few.get_value_and_error(bs_sim)
        v_many, e2 = many.get_value_and_error(bs_sim)
        assert v_many > v_few - 2 * (e1 + e2)

    def test_insample_at_least_split(self, bs_sim, ex_times):
        # in-sample LS carries foresight bias upward
        ins = BermudanOption(ex_times, K, is_call=False,
                             foresight_bias="insample")
        spl = BermudanOption(ex_times, K, is_call=False,
                             foresight_bias="split")
        v_i, e_i = ins.get_value_and_error(bs_sim)
        v_s, e_s = spl.get_value_and_error(bs_sim)
        assert v_i > v_s - 2 * (e_i + e_s)

    def test_merton_early_exercise_premium(self):
        p = MertonParams(100.0, 0.05, 0.25, jump_intensity=0.5,
                         jump_size_mean=-0.2, jump_size_std=0.2)
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.05)
        sim = MonteCarloMertonModel(td, N_PATHS, p, seed=21)
        ex = [i * 0.05 for i in range(1, 21)]
        amer, err = BermudanOption(ex, 110.0,
                                   is_call=False).get_value_and_error(sim)
        eur = EuropeanOption(1.0, 110.0, is_call=False).get_value(sim)
        assert amer > eur + 2 * err          # jumps deepen the premium

    def test_validation(self):
        with pytest.raises(ValueError, match="ascending"):
            BermudanOption([1.0, 0.5], K)
        with pytest.raises(ValueError, match="basis_degree"):
            BermudanOption([1.0], K, basis_degree=0)
        with pytest.raises(ValueError, match="foresight"):
            BermudanOption([1.0], K, foresight_bias="none")
