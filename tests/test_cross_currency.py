"""Cross-currency model tests: exact joint-transition martingales
(covered interest parity is the acid test of the quanto drift algebra),
FX options vs the closed-form hump-vol oracle, deterministic-rate
limits, correlation effects on the FX forward variance, piecewise vols,
and the float-float CCS par identities."""

import math

import numpy as np
import pytest

from finmath_tpu.models.cross_currency import (CrossCurrencyModel,
                                               CrossCurrencySimulation)
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel
from finmath_tpu.models.time_discretization import TimeDiscretization

T_GRID = np.arange(0.0, 21.0)
DC_D = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))
DC_F = DiscountCurve(T_GRID, np.exp(-0.01 * T_GRID))
HW_D = HullWhiteModel(DC_D, 0.1, 0.01)
HW_F = HullWhiteModel(DC_F, 0.05, 0.008)
X0 = 1.25


def make_model(rho_df=0.3, rho_dx=-0.2, rho_fx=0.25, fx_vol=0.10,
               fx_vol_times=None, hw_d=HW_D, hw_f=HW_F):
    return CrossCurrencyModel(hw_d, hw_f, X0, fx_vol, rho_df, rho_dx,
                              rho_fx, fx_vol_times=fx_vol_times)


class TestModelValidation:
    def test_correlation_psd_guard(self):
        with pytest.raises(ValueError, match="PSD"):
            make_model(rho_df=0.9, rho_dx=0.9, rho_fx=-0.9)

    def test_inputs(self):
        with pytest.raises(ValueError):
            CrossCurrencyModel(HW_D, HW_F, -1.0, 0.1, 0.0, 0.0, 0.0)
        with pytest.raises(ValueError):
            make_model(fx_vol=[0.1, 0.2])            # missing times
        with pytest.raises(ValueError):
            make_model(fx_vol=[0.1, 0.2], fx_vol_times=[0.5, 1.0])
        with pytest.raises(ValueError):
            make_model(fx_vol=-0.1)

    def test_fx_forward(self):
        m = make_model()
        f = m.fx_forward(5.0)
        assert np.isclose(f, X0 * DC_F.get_discount_factor(5.0)
                          / DC_D.get_discount_factor(5.0))


class TestAnalyticOracle:
    def test_deterministic_rate_limit_is_black(self):
        # vanishing rate vols: v^2 -> sigma_x^2 T, price -> Garman-
        # Kohlhagen
        tiny_d = HullWhiteModel(DC_D, 0.1, 1e-8)
        tiny_f = HullWhiteModel(DC_F, 0.05, 1e-8)
        m = make_model(hw_d=tiny_d, hw_f=tiny_f)
        t, k, sx = 5.0, 1.3, 0.10
        # residual is the cross term LINEAR in the 1e-8 rate vol
        # (~2 rho sigma_r sigma_x B T), not quadrature error
        assert abs(m.fx_forward_variance(t) - sx * sx * t) < 5e-8
        f = float(m.fx_forward(t))
        df = float(DC_D.get_discount_factor(t))
        sp = sx * math.sqrt(t)
        d1 = (math.log(f / k) + 0.5 * sp * sp) / sp
        from finmath_tpu.models.analytic import _norm_cdf
        black = df * (f * _norm_cdf(d1) - k * _norm_cdf(d1 - sp))
        assert abs(m.fx_option(t, k) - black) < 5e-8

    def test_variance_correlation_signs(self):
        # +rho_dx ADDS domestic-rate vol to the forward (P_d in the
        # denominator), +rho_fx REMOVES foreign-rate vol
        base = make_model(rho_dx=0.0, rho_fx=0.0).fx_forward_variance(5.0)
        up_dx = make_model(rho_dx=0.5,
                           rho_fx=0.0).fx_forward_variance(5.0)
        up_fx = make_model(rho_dx=0.0,
                           rho_fx=0.5).fx_forward_variance(5.0)
        assert up_dx > base > up_fx

    def test_piecewise_fx_vol(self):
        tiny_d = HullWhiteModel(DC_D, 0.1, 1e-8)
        tiny_f = HullWhiteModel(DC_F, 0.05, 1e-8)
        m = make_model(hw_d=tiny_d, hw_f=tiny_f, fx_vol=[0.10, 0.20],
                       fx_vol_times=[0.0, 2.0])
        v2 = m.fx_forward_variance(5.0)
        assert abs(v2 - (0.01 * 2.0 + 0.04 * 3.0)) < 5e-8
        assert m.fx_vol_at(1.0) == 0.10 and m.fx_vol_at(2.0) == 0.20


class TestSimulation:
    @pytest.fixture(scope="class")
    def sim(self):
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
        return CrossCurrencySimulation(make_model(), td,
                                       num_paths=150_000, seed=5,
                                       antithetic=True)

    def test_exact_martingales(self, sim):
        # every identity here holds EXACTLY in distribution; deviations
        # are pure MC noise (~1e-4 relative at 150k antithetic paths)
        for t, tm in ((2.0, 7.0), (5.0, 10.0)):
            d = sim.martingale_diagnostics(t, tm)
            for key, (mc, an) in d.items():
                assert abs(mc / an - 1.0) < 6e-4, (key, mc, an)

    def test_fx_option_vs_closed_form(self, sim):
        m = sim.model
        strikes = [1.0, 1.25, 1.5, 1.8]
        fwd, prices, se = sim.mc_fx_option_prices(5.0, strikes)
        assert abs(fwd / m.fx_forward(5.0) - 1.0) < 1e-3
        for k, p, s in zip(strikes, prices, se):
            cf = m.fx_option(5.0, k)
            assert abs(p - cf) < 4.5 * s + 1e-5, (k, p, cf, s)
        # puts through parity: call - put = df (F - K)
        _, puts, pse = sim.mc_fx_option_prices(5.0, strikes,
                                               is_call=False)
        df = float(DC_D.get_discount_factor(5.0))
        for k, c, p, s1, s2 in zip(strikes, prices, puts, se, pse):
            assert abs((c - p) - df * (m.fx_forward(5.0) - k)) \
                < 4.5 * (s1 + s2) + 1e-5

    def test_eager_accessors(self, sim):
        fx = sim.fx(5.0)
        assert fx.get_filtration_time() == 5.0
        assert fx.get_average() == pytest.approx(
            float(np.mean(fx.get_realizations())))
        # foreign bond carries the quanto mean shift; combined with FX
        # and the numeraire it must average to X0 P_f(0, T)
        pf = sim.bond(5.0, 10.0, foreign=True)
        n = sim.numeraire(5.0)
        v = fx.mult(pf).div(n).get_average()
        assert abs(v / (X0 * DC_F.get_discount_factor(10.0))
                   - 1.0) < 1e-3
        with pytest.raises(ValueError, match="not on the simulation"):
            sim.fx(0.3)
        with pytest.raises(ValueError):
            sim.bond(5.0, 4.0)

    def test_ccs_par_identities(self, sim):
        pay = np.arange(1, 11) * 1.0
        dom, fgn = sim.mc_ccs_legs(pay)
        assert abs(dom - 1.0) < 5e-4
        assert abs(fgn / X0 - 1.0) < 5e-4
        assert abs(sim.mc_ccs_value(pay)) < 1e-3
        with pytest.raises(ValueError):
            sim.mc_ccs_legs([-1.0, 1.0])

    def test_validation(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.5)
        with pytest.raises(ValueError):
            CrossCurrencySimulation(make_model(), td, num_paths=101,
                                    antithetic=True)
        m = make_model(fx_vol=[0.1, 0.2], fx_vol_times=[0.0, 0.75])
        with pytest.raises(ValueError, match="breakpoint"):
            CrossCurrencySimulation(m, td, num_paths=100)


class TestCorrelationEffects:
    def test_mc_variance_tracks_rho(self):
        # common-random-numbers: the simulated terminal log-FX variance
        # must move with rho_dx exactly as the closed form predicts
        td = TimeDiscretization(initial=0.0, num_steps=10, step=0.5)
        out = {}
        for rho in (-0.5, 0.5):
            m = make_model(rho_dx=rho)
            sim = CrossCurrencySimulation(m, td, num_paths=100_000,
                                          seed=11, antithetic=True)
            lnx = np.log(sim.fx(5.0).get_realizations())
            out[rho] = (float(np.var(lnx)), m.fx_forward_variance(5.0))
        for rho in (-0.5, 0.5):
            mc, cf = out[rho]
            assert abs(mc / cf - 1.0) < 0.02
        assert out[0.5][0] > out[-0.5][0]


class TestExposureEngine:
    @pytest.fixture(scope="class")
    def sim(self):
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
        return CrossCurrencySimulation(make_model(), td,
                                       num_paths=150_000, seed=5,
                                       antithetic=True)

    def test_ccs_ee_matches_fx_option_oracle(self, sim):
        from finmath_tpu.models.cross_currency import (
            CCSTrade, CrossCurrencyExposureEngine)
        eng = CrossCurrencyExposureEngine(
            sim, [CCSTrade(tuple(np.arange(1, 11) * 1.0))])
        prof = eng.profile()
        m = sim.model
        # AT a reset date the zero-basis CCS is worth (X(t)/X0 - 1)
        # pathwise, so EE(t) = fx_option(t, X0) / X0 EXACTLY
        for t in (1.0, 5.0, 9.0):
            i = list(prof.times).index(t)
            oracle = m.fx_option(t, X0) / X0
            assert abs(prof.ee[i] / oracle - 1.0) < 6e-3, (t, prof.ee[i])
        # forward value: remaining stream from the live fixing t_{j-1}
        # is par in each currency AT t_{j-1}:
        # E[V/N](t) = P_f(0, t_{j-1}) - P_d(0, t_{j-1}) exactly
        for i, t in enumerate(prof.times):
            # live fixing = last payment date <= t (annual grid)
            t_fix = float(np.floor(t + 1e-9))
            oracle = float(DC_F.get_discount_factor(t_fix)
                           - DC_D.get_discount_factor(t_fix))
            if t >= 10.0 - 1e-9:
                oracle = 0.0      # settled
            assert abs(prof.forward_value[i] - oracle) < 8e-4, (t,)
        # EE + ENE = forward value (same paths, exact decomposition)
        assert np.allclose(prof.ee + prof.ene, prof.forward_value,
                           atol=1e-12)
        assert eng.cva(0.01) > 0.0

    def test_direction_and_netting(self, sim):
        from finmath_tpu.models.cross_currency import (
            CCSTrade, CrossCurrencyExposureEngine)
        pay = tuple(np.arange(1, 6) * 1.0)
        rec = CrossCurrencyExposureEngine(sim, [CCSTrade(pay)])
        pay_side = CrossCurrencyExposureEngine(
            sim, [CCSTrade(pay, receive_foreign=False)])
        both = CrossCurrencyExposureEngine(
            sim, [CCSTrade(pay), CCSTrade(pay, receive_foreign=False)])
        p_r, p_p, p_b = rec.profile(), pay_side.profile(), both.profile()
        # mirror trades: EE of one = -ENE of the other
        assert np.allclose(p_r.ee, -p_p.ene, atol=1e-12)
        # perfect netting kills the netted exposure, standalone keeps it
        assert np.allclose(p_b.ee, 0.0, atol=1e-12)
        assert np.all(p_b.ee_standalone[:-1] > 0.0)

    def test_fx_forward_trade_and_basis(self, sim):
        from finmath_tpu.models.cross_currency import (
            CCSTrade, CrossCurrencyExposureEngine, FXForwardTrade)
        m = sim.model
        eng = CrossCurrencyExposureEngine(sim, [FXForwardTrade(5.0, 1.3)])
        prof = eng.profile()
        # covered parity: E[V/N] = X0 P_f(0,5) - 1.3 P_d(0,5) while live
        live_oracle = X0 * float(DC_F.get_discount_factor(5.0)) \
            - 1.3 * float(DC_D.get_discount_factor(5.0))
        live = prof.times < 5.0 - 1e-9
        assert np.max(np.abs(prof.forward_value[live]
                             - live_oracle)) < 8e-4
        assert np.allclose(prof.ee[~live], 0.0)
        # EE at expiry-adjacent date equals the (t, 1.3/...) FX option:
        i = int(np.searchsorted(prof.times, 4.5))
        oracle = m.fx_option(4.5, 1.3 * float(
            DC_D.get_discount_factor(5.0) / DC_F.get_discount_factor(5.0)))
        # forward on the bond-adjusted strike only approximates the
        # deferred payoff; assert the cheap sanity bound instead
        assert 0.0 < prof.ee[i] < 2.0 * oracle + 0.1
        # a positive basis raises the foreign leg -> EE up under CRN
        base = CrossCurrencyExposureEngine(
            sim, [CCSTrade(tuple(np.arange(1, 6) * 1.0))]).profile()
        sprd = CrossCurrencyExposureEngine(
            sim, [CCSTrade(tuple(np.arange(1, 6) * 1.0),
                           foreign_basis=0.005)]).profile()
        assert np.all(sprd.ee[:-1] >= base.ee[:-1] - 1e-12)
        assert sprd.ee[0] > base.ee[0]

    def test_validation(self, sim):
        from finmath_tpu.models.cross_currency import (
            CCSTrade, CrossCurrencyExposureEngine, FXForwardTrade)
        with pytest.raises(ValueError):
            CrossCurrencyExposureEngine(sim, [])
        with pytest.raises(ValueError, match="not on the simulation"):
            CrossCurrencyExposureEngine(sim, [FXForwardTrade(5.3, 1.2)])
        with pytest.raises(ValueError, match="not on the"):
            CrossCurrencyExposureEngine(sim, [CCSTrade((1.0, 2.3))])
        with pytest.raises(ValueError):
            CrossCurrencyExposureEngine(sim, [CCSTrade((-1.0, 2.0))])
        with pytest.raises(ValueError):
            CrossCurrencyExposureEngine(sim, ["swap"])
