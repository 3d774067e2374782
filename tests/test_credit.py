"""Credit layer tests: survival curves, CDS analytics + bootstrap,
CIR++ intensity (exact fit, limits), doubly-stochastic simulation
(martingale + default-time construction), and the wrong-way-risk CVA
engine (independence factorization at rho=0, WWR/RWR monotonicity in
rho, payer/receiver symmetry of the effect)."""

import math

import numpy as np
import pytest

from finmath_tpu.models.credit import (
    CIRPPIntensityModel, CIRPPSimulation, SurvivalCurve,
    WrongWayRiskCVAEngine, bootstrap_survival_curve, cds_legs,
    cds_par_spread, cds_value, par_swap_rate)
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel
from finmath_tpu.models.time_discretization import TimeDiscretization

T_GRID = np.arange(0.0, 31.0)
DC = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))


class TestSurvivalCurve:
    def test_cumulative_hazard_piecewise(self):
        c = SurvivalCurve([0.0, 1.0, 3.0], [0.01, 0.02, 0.05])
        assert c.cumulative_hazard(0.0) == 0.0
        assert np.isclose(c.cumulative_hazard(0.5), 0.005)
        assert np.isclose(c.cumulative_hazard(2.0), 0.01 + 0.02)
        # last hazard extends to infinity
        assert np.isclose(c.cumulative_hazard(10.0),
                          0.01 + 0.04 + 7.0 * 0.05)
        q = c.get_survival_probability([1.0, 2.0])
        assert np.allclose(q, np.exp(-np.array([0.01, 0.03])))
        assert np.isclose(c.default_probability(1.0, 2.0), q[0] - q[1])
        assert c.get_hazard_rate(2.5) == 0.02

    def test_validation(self):
        with pytest.raises(ValueError):
            SurvivalCurve([0.5, 1.0], [0.01, 0.02])        # not from 0
        with pytest.raises(ValueError):
            SurvivalCurve([0.0, 1.0], [0.01, -0.02])       # negative
        with pytest.raises(ValueError):
            SurvivalCurve([0.0, 1.0], [0.01])              # misaligned


class TestCDS:
    def test_par_spread_prices_to_zero(self):
        c = SurvivalCurve([0.0, 2.0], [0.015, 0.03])
        s = cds_par_spread(DC, c, 5.0, recovery=0.4)
        assert abs(cds_value(DC, c, 5.0, s, recovery=0.4)) < 1e-15
        # protection seller's value is the negative
        assert cds_value(DC, c, 5.0, s * 1.1,
                         protection_buyer=False) == pytest.approx(
            -cds_value(DC, c, 5.0, s * 1.1))

    def test_credit_triangle(self):
        # flat hazard: par spread ~ (1-R) * lambda up to the bucket
        # discretization (quarterly: sub-0.5% relative)
        lam, r = 0.02, 0.4
        c = SurvivalCurve([0.0], [lam])
        s = cds_par_spread(DC, c, 5.0, recovery=r)
        assert abs(s - (1.0 - r) * lam) < 0.005 * (1.0 - r) * lam

    def test_legs_positive_and_monotone_in_hazard(self):
        lo = SurvivalCurve([0.0], [0.01])
        hi = SurvivalCurve([0.0], [0.05])
        p_lo, a_lo = cds_legs(DC, lo, 5.0)
        p_hi, a_hi = cds_legs(DC, hi, 5.0)
        assert 0 < p_lo < p_hi            # more default risk
        assert a_hi < a_lo                # shorter expected premium stream
        with pytest.raises(ValueError):
            cds_legs(DC, lo, 5.1)         # off-schedule maturity
        with pytest.raises(ValueError):
            cds_legs(DC, lo, 5.0, recovery=1.0)

    def test_bootstrap_reprices_quotes_exactly(self):
        mats = [1.0, 3.0, 5.0, 7.0, 10.0]
        spreads = [0.006, 0.009, 0.012, 0.014, 0.016]
        curve = bootstrap_survival_curve(DC, mats, spreads, recovery=0.4)
        assert curve.hazards.size == len(mats)
        for m, s in zip(mats, spreads):
            assert abs(cds_value(DC, curve, m, s, recovery=0.4)) < 1e-12
            assert abs(cds_par_spread(DC, curve, m, recovery=0.4)
                       - s) < 1e-10
        # hazards positive, survival decreasing
        assert np.all(curve.hazards > 0)
        q = curve.get_survival_probability(mats)
        assert np.all(np.diff(q) < 0)

    def test_bootstrap_inverted_curve_guard(self):
        # a 2y quote far below the 1y quote forces a negative forward
        # hazard -> loud error
        with pytest.raises(ValueError, match="negative hazard"):
            bootstrap_survival_curve(DC, [1.0, 2.0], [0.05, 0.001])


MKT = SurvivalCurve([0.0, 5.0], [0.025, 0.035])


class TestCIRPP:
    def _model(self, sigma=0.08):
        return CIRPPIntensityModel(MKT, kappa=0.5, theta=0.02,
                                   sigma=sigma, y0=0.02)

    def test_exact_fit_and_psi(self):
        m = self._model()
        t = np.array([1.0, 3.0, 7.0])
        assert np.allclose(m.survival_probability(t),
                           MKT.get_survival_probability(t))
        # market hazard (2.5%+) dominates the CIR forward hazard (~2%)
        # so the shift stays nonnegative: lambda >= 0 pathwise
        assert m.min_psi_on_grid(np.arange(0.0, 10.25, 0.25)) > 0.0
        assert m.feller_satisfied
        assert not CIRPPIntensityModel(MKT, 0.5, 0.02, 0.25,
                                       0.02).feller_satisfied

    def test_cir_bond_deterministic_limit(self):
        # sigma -> 0: P(t) -> exp(-int y_det), y_det' = kappa(theta - y).
        # sigma = 1e-4 keeps the true O(sigma^2) convexity below the
        # tolerance without amplifying base-of-huge-power rounding (the
        # A-term exponent is 2 kappa theta / sigma^2)
        m = self._model(sigma=1e-4)
        for t in [1.0, 5.0, 10.0]:
            integral = (m.theta * t + (m.y0 - m.theta)
                        * (1.0 - math.exp(-m.kappa * t)) / m.kappa)
            assert abs(m.cir_survival(t)
                       - math.exp(-integral)) < 1e-8

    def test_validation(self):
        with pytest.raises(ValueError):
            CIRPPIntensityModel(MKT, -0.5, 0.02, 0.08, 0.02)
        with pytest.raises(ValueError):
            CIRPPIntensityModel(MKT, 0.5, 0.02, 0.08, -0.02)


class TestCIRPPSimulation:
    @pytest.fixture(scope="class")
    def sim(self):
        model = CIRPPIntensityModel(MKT, kappa=0.5, theta=0.02,
                                    sigma=0.08, y0=0.02)
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.25)
        return CIRPPSimulation(model, td, num_paths=40_000, seed=7,
                               antithetic=True, substeps=4)

    def test_survival_martingale(self, sim):
        # E[exp(-Lambda(t))] must reproduce the market curve up to the
        # CIR Euler bias + MC noise
        for t in [1.0, 3.0, 5.0]:
            q = MKT.get_survival_probability(t)
            assert abs(sim.expected_survival(t) - q) < 2e-3

    def test_survival_pathwise_properties(self, sim):
        s3 = sim.survival(3.0).get_realizations()
        s5 = sim.survival(5.0).get_realizations()
        assert np.all(s5 <= s3 + 1e-12)      # Lambda nondecreasing
        assert np.all((s3 > 0) & (s3 <= 1.0 + 1e-12))

    def test_default_indicators(self, sim):
        i3 = sim.default_indicators(3.0).get_realizations()
        i5 = sim.default_indicators(5.0).get_realizations()
        assert set(np.unique(i3)) <= {0.0, 1.0}
        assert np.all(i5 >= i3)              # monotone pathwise
        pd5 = 1.0 - MKT.get_survival_probability(5.0)
        # binomial noise at 40k paths: sigma ~ sqrt(pd(1-pd)/N) ~ 0.0017
        assert abs(float(np.mean(i5)) - pd5) < 4 * 0.0017 + 2e-3

    def test_mc_cds_matches_analytic(self, sim):
        p_mc, a_mc = sim.mc_cds_legs(DC, 5.0, recovery=0.4)
        p_an, a_an = cds_legs(DC, MKT, 5.0, recovery=0.4)
        assert abs(p_mc - p_an) < 2e-3 * max(p_an, 1e-9) + 2e-3
        assert abs(a_mc - a_an) < 2e-3 * a_an + 2e-3

    def test_validation(self):
        model = CIRPPIntensityModel(MKT, 0.5, 0.02, 0.08, 0.02)
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        with pytest.raises(ValueError):
            CIRPPSimulation(model, td, num_paths=101, antithetic=True)
        with pytest.raises(ValueError):
            CIRPPSimulation(model, td, num_paths=100, substeps=0)
        sim = CIRPPSimulation(model, td, num_paths=100)
        with pytest.raises(ValueError, match="not on the simulation"):
            sim.survival(0.3)


class TestWWRCVA:
    PAY = np.arange(1, 11) * 0.5        # 5y semiannual swap

    @pytest.fixture(scope="class")
    def setup(self):
        hw = HullWhiteModel(DC, mean_reversion=0.1, volatility=0.01)
        intensity = CIRPPIntensityModel(MKT, kappa=0.5, theta=0.02,
                                        sigma=0.10, y0=0.02)
        k = par_swap_rate(DC, self.PAY)
        return hw, intensity, k

    def _engine(self, setup, rho, payer=True, paths=60_000):
        hw, intensity, k = setup
        return WrongWayRiskCVAEngine(
            hw, intensity, self.PAY, k, num_paths=paths, payer=payer,
            recovery=0.4, correlation=rho, seed=99, antithetic=True,
            substeps=2)

    def test_par_rate(self, setup):
        _, _, k = setup
        deltas = np.diff(np.concatenate([[0.0], self.PAY]))
        df = DC.get_discount_factor(self.PAY)
        # par: fixed leg PV == float leg PV
        assert np.isclose(k * np.sum(deltas * df), 1.0 - df[-1])

    def test_independence_factorization_at_rho_zero(self, setup):
        res = self._engine(setup, rho=0.0).compute()
        assert res.cva > 0.0
        # with rho = 0 the pathwise estimator factorizes into the
        # product of means up to MC correlation noise
        assert abs(res.cva - res.cva_independent) < 0.03 * res.cva
        # survival diagnostics track the market curve (Euler bias bound)
        q = MKT.get_survival_probability(res.observation_times)
        assert np.max(np.abs(res.expected_survival - q)) < 3e-3
        # bucket contributions are nonnegative and sum to the CVA
        assert np.all(res.contributions > -1e-12)
        assert np.isclose(np.sum(res.contributions), res.cva)
        # final bucket: the swap has settled, exposure is zero
        assert abs(res.contributions[-1]) < 1e-15

    def test_wrong_way_monotone_in_rho_payer(self, setup):
        cvas = [self._engine(setup, rho).compute() for rho in
                (-0.9, 0.0, 0.9)]
        # payer swap: exposure rises with rates; positive rate-credit
        # correlation clusters defaults with high exposure -> CVA up
        assert cvas[0].cva < cvas[1].cva < cvas[2].cva
        assert cvas[2].wwr_ratio > 1.02
        assert cvas[0].wwr_ratio < 0.98

    def test_right_way_for_receiver(self, setup):
        up = self._engine(setup, 0.9, payer=False).compute()
        dn = self._engine(setup, -0.9, payer=False).compute()
        # receiver exposure rises when rates FALL -> rho > 0 is
        # right-way risk, the mirror of the payer case
        assert up.cva < dn.cva
        assert up.wwr_ratio < 1.0 < dn.wwr_ratio

    def test_validation(self, setup):
        hw, intensity, k = setup
        with pytest.raises(ValueError):
            WrongWayRiskCVAEngine(hw, intensity, self.PAY, k,
                                  correlation=1.5)
        with pytest.raises(ValueError):
            WrongWayRiskCVAEngine(hw, intensity, [-1.0, 1.0], k)
        with pytest.raises(ValueError):
            WrongWayRiskCVAEngine(hw, intensity, self.PAY, k,
                                  num_paths=101, antithetic=True)
        with pytest.raises(ValueError, match="not on the grid"):
            WrongWayRiskCVAEngine(
                hw, intensity, self.PAY, k,
                time_discretization=TimeDiscretization(
                    initial=0.0, num_steps=5, step=1.0))
