"""Market-risk engine tests: full-revaluation VaR/ES vs the
delta-normal control (agreement on a delta-dominated book, gamma
ordering on a convex one), the exact Euler/ES allocation identity,
historical simulation, quantile stderr calibration, and the Kupiec
backtest."""

import math

import numpy as np
import pytest

from finmath_tpu.models.risk import (MarketRiskEngine, OptionBook,
                                     expected_shortfall, kupiec_pvalue,
                                     value_at_risk)

COV = np.array([[0.04, 0.012], [0.012, 0.09]])


def convex_book():
    return OptionBook(spots=[100.0, 50.0], rate=0.02,
                      underlying_index=[0, 0, 1, 1],
                      strikes=[100.0, 110.0, 50.0, 45.0],
                      expiries=[0.5, 1.0, 0.25, 1.0],
                      vols=[0.2, 0.22, 0.3, 0.28],
                      notionals=[100.0, -50.0, 80.0, 40.0],
                      is_call=[True, True, True, False])


def delta_book():
    # deep-ITM long calls ~ forwards: gamma-negligible, so full
    # revaluation must agree with delta-normal tightly
    return OptionBook(spots=[100.0], rate=0.02, underlying_index=[0],
                      strikes=[20.0], expiries=[1.0], vols=[0.2],
                      notionals=[100.0])


class TestHelpers:
    def test_var_es_on_normal_samples(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0.0, 1.0, 1_000_000)
        assert abs(value_at_risk(x, 0.99) - 2.3263) < 0.02
        es_exact = math.exp(-0.5 * 2.3263 ** 2) / math.sqrt(
            2 * math.pi) / 0.01
        assert abs(expected_shortfall(x, 0.99) - es_exact) < 0.03
        assert expected_shortfall(x, 0.99) > value_at_risk(x, 0.99)
        with pytest.raises(ValueError):
            value_at_risk(x, 0.4)

    def test_kupiec(self):
        # exactly-expected breaches: no rejection; way too many: reject
        assert kupiec_pvalue(10, 1000, 0.99) > 0.9
        assert kupiec_pvalue(30, 1000, 0.99) < 1e-4
        assert kupiec_pvalue(0, 1000, 0.99) > 1e-6
        with pytest.raises(ValueError):
            kupiec_pvalue(-1, 100)


class TestBookValidation:
    def test_inputs(self):
        with pytest.raises(ValueError):
            OptionBook([100.0], 0.0, [1], [100.0], [1.0], [0.2], [1.0])
        with pytest.raises(ValueError):
            OptionBook([100.0], 0.0, [0], [-1.0], [1.0], [0.2], [1.0])
        with pytest.raises(ValueError):
            OptionBook([100.0], 0.0, [0, 0], [100.0], [1.0], [0.2],
                       [1.0])
        with pytest.raises(ValueError):
            MarketRiskEngine(convex_book(), horizon=-1.0)


class TestFullRevaluation:
    @pytest.fixture(scope="class")
    def rep(self):
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        return eng.parametric_mc(COV, num_scenarios=400_000,
                                 quantile=0.99, seed=5)

    def test_coherence_and_allocation(self, rep):
        assert rep.expected_shortfall > rep.var > 0
        assert rep.stderr_var > 0
        # Euler/ES allocation identity is EXACT on the same scenarios
        assert abs(np.sum(rep.component_es)
                   - rep.expected_shortfall) < 1e-9
        # the short position hedges: its component is negative
        assert rep.component_es[1] < 0

    def test_delta_normal_agreement_gamma_free(self):
        eng = MarketRiskEngine(delta_book(), horizon=1 / 252)
        cov1 = np.array([[0.04]])
        rep = eng.parametric_mc(cov1, num_scenarios=400_000, seed=7)
        dn = eng.delta_normal_var(cov1, 0.99)
        assert abs(rep.var - dn) / dn < 0.02

    def test_gamma_reduces_tail_vs_delta_normal(self, rep):
        # the convex book is net long gamma: full-revaluation VaR sits
        # BELOW the linearized delta-normal number
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        dn = eng.delta_normal_var(COV, 0.99)
        assert rep.var < dn

    def test_quantile_stderr_calibrated(self):
        # independent seeds scatter consistently with the reported se
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        vars_ = [eng.parametric_mc(COV, num_scenarios=100_000,
                                   seed=s).var for s in (1, 2, 3, 4)]
        se = eng.parametric_mc(COV, num_scenarios=100_000,
                               seed=1).stderr_var
        assert np.std(vars_) < 5 * se
        assert np.std(vars_) > se / 5

    def test_vol_shocks_add_risk(self):
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        base = eng.parametric_mc(COV, num_scenarios=200_000, seed=5)
        vega = eng.parametric_mc(COV, num_scenarios=200_000, seed=5,
                                 vol_covariance=np.diag([1.0, 1.0]))
        assert vega.var > base.var

    def test_historical(self):
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        rng = np.random.default_rng(0)
        hist = rng.multivariate_normal([0, 0], COV / 252, size=2000)
        rh = eng.historical(hist, quantile=0.99)
        rp = eng.parametric_mc(COV, num_scenarios=400_000, seed=5)
        # same generating law: the two estimators agree loosely (2000
        # historical days is a noisy quantile)
        assert abs(rh.var - rp.var) / rp.var < 0.25
        with pytest.raises(ValueError):
            eng.historical(hist[:, :1])

    def test_validation(self):
        eng = MarketRiskEngine(convex_book(), horizon=1 / 252)
        with pytest.raises(ValueError):
            eng.parametric_mc(np.eye(3))
        with pytest.raises(ValueError):
            eng.parametric_mc(COV, quantile=0.3)
