"""Schwartz-Smith commodity tests: futures-curve martingale under the
exact simulation, options on futures vs Black-76 with the closed-form
variance, Margrabe calendar spreads, term-structure limits, and the
Samuelson effect."""

import math

import numpy as np
import pytest

from finmath_tpu.models.commodity import (SchwartzSmithModel,
                                          SchwartzSmithSimulation)
from finmath_tpu.models.time_discretization import TimeDiscretization


def make_model(**kw):
    base = dict(chi0=0.1, xi0=math.log(60.0), kappa=1.5, sigma_chi=0.35,
                sigma_xi=0.15, rho=0.3, mu_star=0.01, lambda_chi=0.05)
    base.update(kw)
    return SchwartzSmithModel(**base)


class TestAnalytic:
    def test_futures_limits(self):
        m = make_model()
        # short end: F(0, 0) = spot = exp(chi0 + xi0)
        assert np.isclose(float(m.futures_price(0.0)),
                          math.exp(0.1 + math.log(60.0)))
        # long end: chi0's effect decays at rate kappa
        f10 = float(m.futures_price(10.0))
        m0 = make_model(chi0=0.0)
        assert abs(f10 / float(m0.futures_price(10.0)) - 1.0) < 1e-6

    def test_samuelson_effect(self):
        # futures volatility RISES as maturity approaches: v(t, T)/
        # sqrt(t) is larger for T closer to t
        m = make_model()
        near = m.log_futures_variance(1.0, 1.25)
        far = m.log_futures_variance(1.0, 5.0)
        assert near > far

    def test_option_put_call_parity(self):
        m = make_model()
        f = float(m.futures_price(2.0))
        for k in (50.0, 60.0, 70.0):
            c = m.option_on_future(1.0, 2.0, k, 0.97)
            p = m.option_on_future(1.0, 2.0, k, 0.97, is_call=False)
            assert abs((c - p) - 0.97 * (f - k)) < 1e-12

    def test_margrabe_degenerate(self):
        # T1 = T2: spread is identically zero
        m = make_model()
        assert m.calendar_spread_margrabe(1.0, 2.0, 2.0) < 1e-10

    def test_validation(self):
        with pytest.raises(ValueError):
            make_model(kappa=-1.0)
        with pytest.raises(ValueError):
            make_model(rho=1.0)
        m = make_model()
        with pytest.raises(ValueError):
            m.option_on_future(2.0, 1.0, 60.0)
        with pytest.raises(ValueError):
            m.log_futures_variance(2.0, 1.0)


class TestSimulation:
    @pytest.fixture(scope="class")
    def sim(self):
        td = TimeDiscretization(initial=0.0, num_steps=24, step=1 / 12)
        return SchwartzSmithSimulation(make_model(), td,
                                       num_paths=200_000, seed=2)

    def test_futures_martingale(self, sim):
        # E[F(t, T)] = F(0, T) exactly in distribution
        mats = [1.5, 2.0, 3.0, 5.0]
        p, se = sim.mc_futures_prices(1.0, mats)
        for t, pp, s in zip(mats, p, se):
            f0 = float(sim.model.futures_price(t))
            assert abs(pp - f0) < 4 * s + 1e-9, (t, pp, f0)

    def test_spot_expectation(self, sim):
        s1 = sim.spot(1.0)
        f0 = float(sim.model.futures_price(1.0))
        se = s1.get_standard_error()
        assert abs(s1.get_average() - f0) < 4 * se

    def test_option_vs_black(self, sim):
        m = sim.model
        strikes = [55.0, 65.0, 75.0]
        pr, se = sim.mc_option_on_future(1.0, 2.0, strikes, 0.97)
        for k, pp, s in zip(strikes, pr, se):
            cf = m.option_on_future(1.0, 2.0, k, 0.97)
            assert abs(pp - cf) < 4.5 * s + 1e-6, (k, pp, cf)
        # puts
        pr_p, se_p = sim.mc_option_on_future(1.0, 2.0, strikes, 0.97,
                                             is_call=False)
        for k, pp, s in zip(strikes, pr_p, se_p):
            cf = m.option_on_future(1.0, 2.0, k, 0.97, is_call=False)
            assert abs(pp - cf) < 4.5 * s + 1e-6

    def test_calendar_spread_vs_margrabe(self, sim):
        m = sim.model
        sp, se = sim.mc_calendar_spread(1.0, 1.5, 2.0, 0.0, 0.97)
        mg = m.calendar_spread_margrabe(1.0, 1.5, 2.0, 0.97)
        assert abs(sp - mg) < 4.5 * se + 1e-6
        # struck spread is cheaper than unstruck
        sp_k, _ = sim.mc_calendar_spread(1.0, 1.5, 2.0, 1.0, 0.97)
        assert sp_k < sp

    def test_validation(self, sim):
        with pytest.raises(ValueError, match="not on the simulation"):
            sim.spot(0.99)
        with pytest.raises(ValueError):
            sim.mc_futures_prices(1.0, [0.5])
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        with pytest.raises(ValueError):
            SchwartzSmithSimulation(make_model(), td, num_paths=101,
                                    antithetic=True)
