"""Hull-White model tests (finmath_tpu/models/hull_white.py).

The exact-in-distribution design makes the strongest tests identities,
not tolerances: the simulated numeraire must reproduce the input curve
to MC error at EVERY grid point regardless of step size, the bond
reconstitution must be a martingale, the Gaussian state recursions must
match brute-force quadrature, and MC caplets/swaptions must match the
analytic (Jamshidian) oracle."""

import math

import numpy as np
import pytest

from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import (
    HullWhiteModel,
    HullWhiteSimulation,
    calibrate_hull_white,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

PILLARS = [0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 15.0, 20.0]
ZEROS = [0.010, 0.012, 0.015, 0.017, 0.020, 0.022, 0.024, 0.025, 0.0255]
CURVE = DiscountCurve(PILLARS, list(np.exp(-np.array(ZEROS) * PILLARS)))

A = 0.12
SIGMA = 0.012


@pytest.fixture(scope="module")
def model():
    return HullWhiteModel(CURVE, A, SIGMA)


@pytest.fixture(scope="module")
def model_pw():
    return HullWhiteModel(CURVE, A, [0.010, 0.014, 0.008],
                          vol_times=[0.0, 2.0, 5.0])


@pytest.fixture(scope="module")
def sim(model):
    td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
    return HullWhiteSimulation(model, td, num_paths=200_000, seed=7,
                               antithetic=True)


class TestGaussianState:
    def test_matches_quadrature(self, model_pw):
        # brute-force the defining integrals against the segment
        # recursion, on a horizon crossing both vol breakpoints
        t = 7.3
        a = model_pw.a
        u = np.linspace(0.0, t, 400_001)
        sig = np.array([model_pw.sigma_at(x) for x in u])
        phi_q = np.trapezoid(sig**2 * np.exp(-2 * a * (t - u)), u)
        b = (1.0 - np.exp(-a * (t - u))) / a
        c_q = np.trapezoid(sig**2 * np.exp(-a * (t - u)) * b, u)
        v_q = np.trapezoid(sig**2 * b * b, u)
        phi, c, v = model_pw.gaussian_state(t)
        # trapezoid error at the sigma discontinuities bounds this
        np.testing.assert_allclose([phi, c, v], [phi_q, c_q, v_q],
                                   rtol=1e-5)

    def test_constant_sigma_closed_forms(self, model):
        t = 4.0
        phi, c, _ = model.gaussian_state(t)
        phi_cf = SIGMA**2 * (1 - math.exp(-2 * A * t)) / (2 * A)
        c_cf = SIGMA**2 / (2 * A**2) * (1 - math.exp(-A * t)) ** 2
        np.testing.assert_allclose([phi, c], [phi_cf, c_cf], rtol=1e-12)


class TestMartingales:
    def test_numeraire_reproduces_curve(self, sim, model):
        # E[1/N(t)] == P(0,t) at every grid point, 10y horizon,
        # 0.5y steps — exact scheme, only MC noise remains
        for t in [0.5, 2.0, 5.0, 10.0]:
            got = sim.mc_bond_price(t)
            want = float(model.df(t))
            assert abs(got - want) / want < 7e-4, (t, got, want)

    def test_bond_reconstitution_martingale(self, sim, model):
        # E[P(t,T)/N(t)] == P(0,T)
        for (t, T) in [(1.0, 5.0), (3.0, 10.0), (5.0, 7.0)]:
            pv = (sim.bond(t, T).div(sim.numeraire(t))).get_average()
            want = float(model.df(T))
            assert abs(pv - want) / want < 7e-4, (t, T, pv, want)

    def test_short_rate_mean(self, sim, model):
        # E[r(t)] = f(0,t) + C(t)
        t = 5.0
        got = sim.short_rate(t).get_average()
        _, c, _ = model.gaussian_state(t)
        want = model.forward_rate(t) + c
        assert abs(got - want) < 5e-4

    def test_state_variance_matches_phi(self, sim, model):
        t = 5.0
        phi, _, _ = model.gaussian_state(t)
        var = sim.short_rate(t).get_variance()
        assert abs(var - phi) / phi < 2e-2


class TestAnalyticPricers:
    def test_bond_option_put_call_parity(self, model):
        c = model.bond_option(2.0, 5.0, 0.92, is_call=True)
        p = model.bond_option(2.0, 5.0, 0.92, is_call=False)
        # C - P = df(T_B) - K df(T_O)
        want = float(model.df(5.0) - 0.92 * model.df(2.0))
        np.testing.assert_allclose(c - p, want, atol=1e-14)

    def test_zero_vol_limit_is_intrinsic(self):
        m = HullWhiteModel(CURVE, A, 1e-9)
        f = float(m.df(5.0) / m.df(2.0))
        got = m.bond_option(2.0, 5.0, f * 0.95, is_call=True)
        want = float(m.df(2.0)) * f * 0.05
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_swaption_decreases_in_strike_payer(self, model):
        pts = [3.0, 3.5, 4.0, 4.5, 5.0]
        vals = [model.swaption(2.0, pts, k) for k in (0.01, 0.02, 0.03)]
        assert vals[0] > vals[1] > vals[2] > 0

    def test_swaption_parity(self, model):
        # payer - receiver = value of the forward swap
        pts = [3.0, 3.5, 4.0, 4.5, 5.0]
        k = 0.02
        pay = model.swaption(2.0, pts, k, payer=True)
        rec = model.swaption(2.0, pts, k, payer=False)
        deltas = np.diff(np.concatenate([[2.0], pts]))
        annuity = float(np.sum(deltas * model.df(pts)))
        fwd_swap = float(model.df(2.0) - model.df(5.0)) - k * annuity
        np.testing.assert_allclose(pay - rec, fwd_swap, atol=1e-10)

    def test_caplet_positive_and_bounded(self, model):
        c = model.caplet(2.0, 2.5, 0.02)
        assert 0 < c < 0.5 * float(model.df(2.5))


class TestMonteCarloVsAnalytic:
    def test_caplet(self, sim, model):
        for k in (0.01, 0.02, 0.04):
            mc = sim.mc_caplet_price(2.0, 2.5, k)
            an = model.caplet(2.0, 2.5, k)
            assert abs(mc - an) < max(3e-5, 0.01 * an), (k, mc, an)

    def test_swaption_vs_jamshidian(self, sim, model):
        pts = [3.0, 3.5, 4.0, 4.5, 5.0]
        for k, payer in [(0.015, True), (0.025, True), (0.02, False)]:
            mc = sim.mc_swaption_price(2.0, pts, k, payer=payer)
            an = model.swaption(2.0, pts, k, payer=payer)
            assert abs(mc - an) < max(4e-5, 0.012 * an), (k, payer, mc, an)

    def test_piecewise_vol_mc_vs_analytic(self, model_pw):
        td = TimeDiscretization(initial=0.0, num_steps=16, step=0.5)
        s = HullWhiteSimulation(model_pw, td, num_paths=200_000, seed=3,
                                antithetic=True)
        pts = [4.0, 4.5, 5.0, 5.5, 6.0]
        mc = s.mc_swaption_price(3.0, pts, 0.02)
        an = model_pw.swaption(3.0, pts, 0.02)
        assert abs(mc - an) < max(4e-5, 0.012 * an)

    def test_coarse_grid_still_exact(self, model):
        # 2.5y steps: the martingale identity still holds (exactness)
        td = TimeDiscretization(initial=0.0, num_steps=4, step=2.5)
        s = HullWhiteSimulation(model, td, num_paths=200_000, seed=5,
                                antithetic=True)
        got = s.mc_bond_price(10.0)
        want = float(model.df(10.0))
        assert abs(got - want) / want < 1e-3


class TestValidationAndCalibration:
    def test_vol_breakpoint_must_be_on_grid(self, model_pw):
        td = TimeDiscretization(initial=0.0, num_steps=5, step=1.3)
        with pytest.raises(ValueError, match="breakpoint"):
            HullWhiteSimulation(model_pw, td, num_paths=8)

    def test_param_validation(self):
        with pytest.raises(ValueError, match="mean_reversion"):
            HullWhiteModel(CURVE, 0.0, 0.01)
        with pytest.raises(ValueError, match="positive"):
            HullWhiteModel(CURVE, 0.1, -0.01)
        with pytest.raises(ValueError, match="vol_times"):
            HullWhiteModel(CURVE, 0.1, [0.01, 0.02])

    def test_off_grid_raises(self, sim):
        with pytest.raises(ValueError, match="grid"):
            sim.numeraire(0.77)

    def test_calibration_recovers_piecewise_vol(self):
        truth = HullWhiteModel(CURVE, A, [0.009, 0.013],
                               vol_times=[0.0, 3.0])
        swaptions = [
            {"expiry": 1.0, "payment_times": [1.5, 2.0, 2.5, 3.0],
             "strike": 0.015},
            {"expiry": 2.0, "payment_times": [2.5, 3.0, 3.5, 4.0],
             "strike": 0.018},
            {"expiry": 5.0, "payment_times": [5.5, 6.0, 6.5, 7.0],
             "strike": 0.022},
        ]
        targets = [truth.swaption(s["expiry"], s["payment_times"],
                                  s["strike"]) for s in swaptions]
        res = calibrate_hull_white(CURVE, A, [0.0, 3.0], swaptions, targets)
        assert res.rms_price_error < 1e-9
        np.testing.assert_allclose(res.model.sigmas, truth.sigmas,
                                   rtol=2e-3)
