"""Delta-hedge simulation + variance swap tests
(finmath_tpu/models/hedging.py): replication mean, sqrt(dt) hedge-error
scaling, and realized-variance fair strikes vs their closed forms."""

import math

import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    MonteCarloBlackScholesModel,
)
from finmath_tpu.models.hedging import DeltaHedgedPortfolio, VarianceSwap
from finmath_tpu.models.merton import MertonParams, MonteCarloMertonModel
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N_PATHS = 100_000


def bs_sim(n_steps, seed=42):
    td = TimeDiscretization(initial=0.0, num_steps=n_steps,
                            step=T / n_steps)
    return MonteCarloBlackScholesModel(td, N_PATHS,
                                       BlackScholesModel(S0, R, SIG),
                                       seed=seed)


class TestDeltaHedge:
    def test_portfolio_reprices_the_option_same_stream(self):
        # portfolio = payoff + hedge error pathwise, so against the
        # SAME-stream MC European the deviation is only the (small)
        # hedge-error mean — the full payoff MC noise cancels
        from finmath_tpu.models.black_scholes import EuropeanOption
        sim = bs_sim(100)
        res = DeltaHedgedPortfolio(T, 105.0).simulate(sim)
        mc_euro = EuropeanOption(T, 105.0).get_value(sim)
        tol = 4 * res["hedge_error_std"] / math.sqrt(N_PATHS) + 1e-4
        assert abs(res["value"] - mc_euro) < tol
        # and against the analytic premium within payoff-level noise
        assert abs(res["value"] - res["premium"]) < 0.25

    def test_put_hedge(self):
        from finmath_tpu.models.black_scholes import EuropeanOption
        sim = bs_sim(100)
        res = DeltaHedgedPortfolio(T, 95.0, is_call=False).simulate(sim)
        an = black_scholes_option_value(S0, R, SIG, T, 95.0,
                                        is_call=False)
        assert abs(res["premium"] - an) < 1e-12
        mc_euro = EuropeanOption(T, 95.0, is_call=False).get_value(sim)
        assert abs(res["value"] - mc_euro) \
            < 4 * res["hedge_error_std"] / math.sqrt(N_PATHS) + 1e-4

    def test_hedge_error_shrinks_like_sqrt_dt(self):
        e_coarse = DeltaHedgedPortfolio(T, 105.0) \
            .simulate(bs_sim(25))["hedge_error_std"]
        e_fine = DeltaHedgedPortfolio(T, 105.0) \
            .simulate(bs_sim(400))["hedge_error_std"]
        ratio = e_coarse / e_fine
        # 16x more rebalance dates -> ~4x smaller residual
        assert 2.5 < ratio < 6.0

    def test_hedge_error_is_centered(self):
        res = DeltaHedgedPortfolio(T, 105.0).simulate(bs_sim(100))
        assert abs(res["hedge_error_mean"]) \
            < 4 * res["hedge_error_std"] / math.sqrt(N_PATHS) + 1e-4

    def test_needs_bs_facade(self):
        td = TimeDiscretization(initial=0.0, num_steps=20, step=T / 20)
        m = MonteCarloMertonModel(
            td, 10_000, MertonParams(S0, R, 0.2, 0.5, -0.1, 0.2))
        with pytest.raises(NotImplementedError):
            DeltaHedgedPortfolio(T, 100.0).get_value(m)


class TestVarianceSwap:
    def test_bs_fair_strike(self):
        sim = bs_sim(250)
        vs = VarianceSwap(T)
        k = vs.fair_strike(sim)
        dt = T / 250
        expect = SIG**2 + (R - 0.5 * SIG**2) ** 2 * dt
        assert abs(k - expect) < 4 * SIG**2 * math.sqrt(2 * dt)  # CLT bound

    def test_value_is_discounted_strike(self):
        sim = bs_sim(100)
        vs = VarianceSwap(T)
        v, e = vs.get_value_and_error(sim)
        assert abs(v - math.exp(-R * T) * vs.fair_strike(sim)) < 1e-12

    def test_merton_jump_contribution(self):
        lam, mu_j, sig_j = 0.8, -0.12, 0.18
        td = TimeDiscretization(initial=0.0, num_steps=50, step=T / 50)
        m = MonteCarloMertonModel(
            td, 200_000, MertonParams(S0, R, 0.2, lam, mu_j, sig_j),
            seed=9)
        k = VarianceSwap(T).fair_strike(m)
        expect = 0.2**2 + lam * (mu_j**2 + sig_j**2)
        # discrete-sampling drift bias is O(dt); jumps widen the CI
        assert abs(k - expect) < 0.15 * expect

    def test_merton_vs_bs_ordering(self):
        # jumps add realized variance
        td = TimeDiscretization(initial=0.0, num_steps=50, step=T / 50)
        m = MonteCarloMertonModel(
            td, 100_000, MertonParams(S0, R, SIG, 0.8, -0.12, 0.18),
            seed=9)
        k_m = VarianceSwap(T).fair_strike(m)
        k_b = VarianceSwap(T).fair_strike(bs_sim(50, seed=9))
        assert k_m > k_b
