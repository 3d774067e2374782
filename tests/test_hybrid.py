"""Hybrid asset-LMM tests (finmath_tpu/models/lmm/hybrid.py).

Oracles: the exact discrete martingale E[S/N] = S0 e^{-qT} (holds by
construction at ANY correlation), the deterministic-rate limit (zero
LMM vol -> Black-Scholes with the curve forward), the frozen-curve
lognormal approximation under stochastic rates (total variance
sigma_S^2 T + int sigma_P^2 + 2 rho sigma_S int sigma_P), and the
common-random-numbers correlation ordering."""

import math

import jax
import numpy as np
import pytest

from finmath_tpu.models.analytic import black_formula
from finmath_tpu.models.caps import (
    CapletVolatilityCurve,
    LIBORVolatilityModelFromCapletCurve,
)
from finmath_tpu.models.curves import DiscountCurve, ForwardCurve
from finmath_tpu.models.lmm.covariance import (
    LIBORCorrelationModelExponentialDecay,
    LIBORCovarianceModelFromVolatilityAndCorrelation,
)
from finmath_tpu.models.lmm.hybrid import HybridAssetLMM
from finmath_tpu.models.lmm.model import LIBORMarketModelTPU
from finmath_tpu.models.time_discretization import TimeDiscretization

PERIOD = 0.5
N_STEPS = 10  # 5Y tenor grid
SIGMA_L = 0.40
PILLARS = [0.5, 1.0, 2.0, 3.0, 5.0]
ZEROS = [0.045, 0.047, 0.050, 0.051, 0.052]
DC = DiscountCurve(PILLARS, list(np.exp(-np.array(ZEROS) * np.array(PILLARS))))
FC = ForwardCurve(DC, payment_offset=PERIOD)
TD = TimeDiscretization(initial=0.0, num_steps=N_STEPS, step=PERIOD)
P0 = np.zeros(0)


def build_model(sigma_l=SIGMA_L, num_factors=1):
    curve = CapletVolatilityCurve([TD.get_last_time()], [sigma_l])
    vm = LIBORVolatilityModelFromCapletCurve(TD, TD, curve)
    cov = LIBORCovarianceModelFromVolatilityAndCorrelation(
        vm, LIBORCorrelationModelExponentialDecay(TD, num_factors))
    return LIBORMarketModelTPU(TD, FC, DC, cov, measure="spot",
                               state_space="lognormal")


def build_hybrid(model=None, rho=0.0, sigma_s=0.20, s0=100.0, q=0.0,
                 num_paths=100_000, seed=11, **kw):
    model = model or build_model()
    return HybridAssetLMM(model, [s0], [sigma_s], rate_correlations=[rho],
                          dividend_yields=[q], num_paths=num_paths,
                          num_factors=1, seed=seed, antithetic=True, **kw)


def bond_vol_profile(expiry_index):
    """Frozen-curve log-vol of P(t, T_e) per simulation step (1-factor
    lognormal LMM): sigma_P(t) = sum_{j=eta(t)}^{e-1} delta L_j(0)
    sigma_L / (1 + delta L_j(0))."""
    out = []
    for s in range(expiry_index):
        t = TD.get_time(s)
        g = 0.0
        for j in range(expiry_index):
            if TD.get_time(j) >= t - 1e-12 and j >= 1:
                L = float(FC.get_forward(TD.get_time(j)))
                g += PERIOD * L * SIGMA_L / (1.0 + PERIOD * L)
        out.append(g)
    return np.asarray(out)


class TestMartingale:
    def test_discounted_asset_is_martingale_any_correlation(self):
        for rho in (0.0, 0.6):
            h = build_hybrid(rho=rho, num_paths=80_000)
            errs = h.martingale_errors(P0)
            assert np.max(np.abs(errs)) < 0.01, (rho, errs)

    def test_dividend_yield_shifts_the_forward(self):
        q = 0.03
        h = build_hybrid(q=q, num_paths=80_000)
        e = 6
        v, se = h.forward_value(P0, e)
        t = TD.get_time(e)
        assert abs(v - 100.0 * math.exp(-q * t)) < 4 * se + 0.02


class TestDeterministicRateLimit:
    def test_zero_rate_vol_is_black_scholes(self):
        model = build_model(sigma_l=1e-12)
        h = build_hybrid(model=model, sigma_s=0.25, num_paths=120_000)
        e, K = 6, 105.0
        t = TD.get_time(e)
        df = float(DC.get_discount_factor(t))
        v, se = h.european_option_value(P0, e, K)
        an = black_formula(100.0 / df, K, 0.25, t, payoff_unit=df)
        assert abs(v - an) < 4 * se + 1e-3 * an


class TestStochasticRates:
    def test_frozen_curve_variance_approximation(self):
        """Call under stochastic rates ~ Black with total variance
        sigma_S^2 T + int sigma_P^2 dt + 2 rho sigma_S int sigma_P dt."""
        e, K, t = 6, 105.0, TD.get_time(6)
        df = float(DC.get_discount_factor(t))
        sig_p = bond_vol_profile(e)
        for rho in (-0.5, 0.5):
            h = build_hybrid(rho=rho, num_paths=200_000)
            v, se = h.european_option_value(P0, e, K)
            var = (0.20 ** 2 * t + PERIOD * np.sum(sig_p ** 2)
                   + 2.0 * rho * 0.20 * PERIOD * np.sum(sig_p))
            an = black_formula(100.0 / df, K, math.sqrt(var / t), t,
                               payoff_unit=df)
            assert abs(v - an) < 0.025 * an + 4 * se, (rho, v, an)

    def test_correlation_ordering_common_random_numbers(self):
        # same seed => same z's; only the mixing changes. Positive
        # equity-rate correlation RAISES the T-forward variance of S
        # (bond and rates move oppositely), so call values are ordered.
        e, K = 6, 105.0
        vals = []
        for rho in (-0.7, 0.0, 0.7):
            h = build_hybrid(rho=rho, num_paths=60_000, seed=5)
            vals.append(h.european_option_value(P0, e, K)[0])
        assert vals[0] < vals[1] < vals[2]

    def test_put_call_parity_under_stochastic_rates(self):
        h = build_hybrid(rho=0.4, num_paths=80_000)
        e, K = 6, 100.0
        t = TD.get_time(e)
        c, se_c = h.european_option_value(P0, e, K, is_call=True)
        p, se_p = h.european_option_value(P0, e, K, is_call=False)
        fwd, _ = h.forward_value(P0, e)
        df = float(DC.get_discount_factor(t))
        # c - p = E[(S-K)/N] = fwd - K df (raw martingale + bond leg;
        # numeraire adjustment cancels only approximately -> 4 sigma)
        lhs = c - p
        rhs = fwd - K * df
        assert abs(lhs - rhs) < 4 * (se_c + se_p) + 5e-3


class TestMultiAsset:
    def test_idiosyncratic_correlation_and_vol_ordering(self):
        model = build_model()
        h = HybridAssetLMM(model, [100.0, 100.0], [0.15, 0.30],
                           rate_correlations=[0.2, 0.2],
                           equity_correlation=[[1.0, 0.5], [0.5, 1.0]],
                           num_paths=60_000, num_factors=1, seed=3,
                           antithetic=True)
        e, K = 6, 100.0
        v_lo, _ = h.european_option_value(P0, e, K, asset_index=0)
        v_hi, _ = h.european_option_value(P0, e, K, asset_index=1)
        assert v_hi > v_lo  # higher vol, same forward
        errs = h.martingale_errors(P0)
        assert np.max(np.abs(errs)) < 0.015

    def test_realized_asset_correlation(self):
        # with zero rate correlation, terminal log-asset correlation
        # must reproduce the idiosyncratic matrix
        model = build_model(sigma_l=1e-12)
        c = 0.65
        h = HybridAssetLMM(model, [100.0, 100.0], [0.2, 0.2],
                           equity_correlation=[[1.0, c], [c, 1.0]],
                           num_paths=60_000, num_factors=1, seed=9,
                           antithetic=True)
        assets, _ = h.simulate(P0)
        logs = np.log(np.asarray(assets[-1]))  # [K, paths]
        got = np.corrcoef(logs)[0, 1]
        assert abs(got - c) < 0.02

    def test_validation(self):
        model = build_model()
        with pytest.raises(ValueError):
            HybridAssetLMM(model, [100.0], [0.2], rate_correlations=[1.2])
        with pytest.raises(ValueError):
            HybridAssetLMM(model, [100.0, 100.0], [0.2, 0.2],
                           equity_correlation=[[1.0, 2.0], [2.0, 1.0]])
        with pytest.raises(ValueError):
            HybridAssetLMM(model, [-1.0], [0.2])
        with pytest.raises(ValueError):
            HybridAssetLMM(model, [100.0], [0.2],
                           observation_indices=[N_STEPS])


class TestDeterminism:
    def test_same_seed_same_value(self):
        e, K = 4, 100.0
        a = build_hybrid(rho=0.3, num_paths=20_000, seed=17)
        b = build_hybrid(rho=0.3, num_paths=20_000, seed=17)
        assert a.european_option_value(P0, e, K) == \
            b.european_option_value(P0, e, K)


def flat_curve(rate, horizon=5.0, n=11):
    t = np.linspace(0.0, horizon, n)
    return DiscountCurve(list(t[1:]), list(np.exp(-rate * t[1:])))


class TestFXAndQuanto:
    R_F = 0.02

    def test_covered_interest_parity_under_stochastic_rates(self):
        # FX = domestic tradable paying the foreign curve as dividend:
        # E[FX/N] = FX0 * df_foreign(T) exactly (telescoping martingale)
        model = build_model()  # stochastic domestic rates, sigma_L = 0.40
        fc_f = flat_curve(self.R_F)
        h = HybridAssetLMM(model, [1.25], [0.10], rate_correlations=[0.3],
                           dividend_yields=[fc_f], num_paths=80_000,
                           num_factors=1, seed=21, antithetic=True)
        e = 6
        v, se = h.forward_value(P0, e)
        t = TD.get_time(e)
        assert abs(v - 1.25 * math.exp(-self.R_F * t)) < 4 * se + 1e-4

    def test_garman_kohlhagen_in_deterministic_limit(self):
        model = build_model(sigma_l=1e-12)
        fc_f = flat_curve(self.R_F)
        h = HybridAssetLMM(model, [1.25], [0.12], dividend_yields=[fc_f],
                           num_paths=120_000, num_factors=1, seed=23,
                           antithetic=True)
        e, K = 6, 1.30
        t = TD.get_time(e)
        df_d = float(DC.get_discount_factor(t))
        v, se = h.european_option_value(P0, e, K)
        fwd = 1.25 * math.exp(-self.R_F * t) / df_d
        an = black_formula(fwd, K, 0.12, t, payoff_unit=df_d)
        assert abs(v - an) < 4 * se + 1e-3 * an

    def test_quanto_closed_form(self):
        # deterministic rates: quanto call = df_d * Black(F_q, K, sigma_S)
        # with F_q = S0 exp((r_f - q - rho sigma_S sigma_X) T)
        model = build_model(sigma_l=1e-12)
        fc_f = flat_curve(self.R_F)
        rho, sig_s, sig_x, q = 0.6, 0.25, 0.12, 0.01
        h = HybridAssetLMM(
            model, [1.25, 80.0], [sig_x, sig_s],
            dividend_yields=[fc_f, q],
            growth_curves=[None, fc_f],
            quanto_fx_indices=[None, 0],
            equity_correlation=[[1.0, rho], [rho, 1.0]],
            num_paths=150_000, num_factors=1, seed=29, antithetic=True)
        e, K = 6, 82.0
        t = TD.get_time(e)
        df_d = float(DC.get_discount_factor(t))
        v, se = h.european_option_value(P0, e, K, asset_index=1)
        f_q = 80.0 * math.exp((self.R_F - q - rho * sig_s * sig_x) * t)
        an = black_formula(f_q, K, sig_s, t, payoff_unit=df_d)
        assert abs(v - an) < 4 * se + 2e-3 * an

    def test_quanto_correlation_sign_common_random_numbers(self):
        model = build_model(sigma_l=1e-12)
        fc_f = flat_curve(self.R_F)
        vals = []
        for rho in (-0.6, 0.0, 0.6):
            h = HybridAssetLMM(
                model, [1.25, 80.0], [0.12, 0.25],
                dividend_yields=[fc_f, 0.0],
                growth_curves=[None, fc_f],
                quanto_fx_indices=[None, 0],
                equity_correlation=[[1.0, rho], [rho, 1.0]],
                num_paths=40_000, num_factors=1, seed=31, antithetic=True)
            vals.append(h.european_option_value(P0, 6, 82.0,
                                                asset_index=1)[0])
        # positive equity-FX correlation LOWERS the quanto forward
        assert vals[0] > vals[1] > vals[2]

    def test_quanto_excluded_from_martingale_check(self):
        model = build_model(sigma_l=1e-12)
        fc_f = flat_curve(self.R_F)
        h = HybridAssetLMM(
            model, [1.25, 80.0], [0.12, 0.25],
            dividend_yields=[fc_f, 0.0],
            growth_curves=[None, fc_f],
            quanto_fx_indices=[None, 0],
            equity_correlation=[[1.0, 0.5], [0.5, 1.0]],
            num_paths=30_000, num_factors=1, seed=3, antithetic=True)
        errs = h.martingale_errors(P0)
        assert np.all(np.isnan(errs[:, 1]))       # quanto: not a tradable
        assert np.nanmax(np.abs(errs[:, 0])) < 0.02  # FX: exact martingale

    def test_quanto_wiring_validation(self):
        model = build_model()
        fc_f = flat_curve(self.R_F)
        with pytest.raises(ValueError, match="growth curve"):
            HybridAssetLMM(model, [1.0, 80.0], [0.1, 0.2],
                           quanto_fx_indices=[None, 0])
        with pytest.raises(ValueError, match="domestic tradable"):
            HybridAssetLMM(model, [1.0, 80.0], [0.1, 0.2],
                           growth_curves=[fc_f, fc_f],
                           quanto_fx_indices=[None, 0])
        with pytest.raises(ValueError, match="invalid"):
            HybridAssetLMM(model, [80.0], [0.2], growth_curves=[fc_f],
                           quanto_fx_indices=[0])


class TestHybridExposure:
    def _engine(self, trades, rho=0.3, sigma_l=SIGMA_L, num_paths=60_000,
                seed=41, **hkw):
        model = build_model(sigma_l=sigma_l)
        h = HybridAssetLMM(model, [100.0], [0.20], rate_correlations=[rho],
                           num_paths=num_paths, num_factors=1, seed=seed,
                           antithetic=True, **hkw)
        from finmath_tpu.models.lmm.hybrid import HybridExposureEngine
        return HybridExposureEngine(h, trades, quantiles=(0.95,))

    def test_forward_profile_martingale_and_identities(self):
        from finmath_tpu.models.lmm.hybrid import EquityForwardTrade

        eng = self._engine([EquityForwardTrade(0, 8, 100.0)])
        prof = eng.profile(P0)
        # E[V/N] flat = t0 value of the forward: S0 - K df(T_m) (exact
        # martingale: both S/N and P(.,T_m)/N are tradables)
        t_m = TD.get_time(8)
        v0 = 100.0 - 100.0 * float(DC.get_discount_factor(t_m))
        live = prof.times <= t_m + 1e-9
        assert np.max(np.abs(prof.forward_value[live] - v0)) < 0.012 * 100.0
        # EE + ENE = forward_value (exact decomposition, same paths)
        assert np.allclose(prof.ee + prof.ene, prof.forward_value,
                           atol=1e-10)
        assert np.all(prof.ee >= 0.0) and np.all(prof.ene <= 0.0)
        # exposure accumulates with horizon before maturity
        live = prof.times <= t_m + 1e-9
        assert prof.ee[live][-1] > prof.ee[live][0]
        # after maturity the trade is settled
        assert np.allclose(prof.ee[~live], 0.0)

    def test_option_profile_mean_preserved_and_t0_value(self):
        from finmath_tpu.models.lmm.hybrid import EquityOptionTrade

        model = build_model()
        h = HybridAssetLMM(model, [100.0], [0.20], rate_correlations=[0.3],
                           num_paths=60_000, num_factors=1, seed=43,
                           antithetic=True)
        from finmath_tpu.models.lmm.hybrid import HybridExposureEngine
        eng = HybridExposureEngine(h, [EquityOptionTrade(0, 6, 105.0)])
        prof = eng.profile(P0)
        v_opt, se = h.european_option_value(P0, 6, 105.0)
        # at expiry the exposure IS the discounted option value
        ev = h.observation_indices.index(6)
        assert abs(prof.ee[ev] - v_opt) < 4 * se + 1e-3
        # the LS regression preserves the mean -> forward_value flat up
        # to expiry (option exposure is nonnegative: ee == forward_value)
        fv_live = prof.forward_value[:ev + 1]
        assert np.max(np.abs(fv_live - v_opt)) < 0.06 * v_opt + 4 * se
        # regression close-outs cannot be negative by more than noise
        assert np.min(prof.ene[:ev + 1]) > -0.05 * v_opt

    def test_netting_long_short_cancels(self):
        from finmath_tpu.models.lmm.hybrid import EquityForwardTrade

        eng = self._engine([EquityForwardTrade(0, 8, 100.0, notional=1.0),
                            EquityForwardTrade(0, 8, 100.0, notional=-1.0)])
        prof = eng.profile(P0)
        assert np.allclose(prof.ee, 0.0, atol=1e-12)
        assert np.allclose(prof.pfe[0.95], 0.0, atol=1e-12)

    def test_wrong_way_risk_through_correlation(self):
        # an FX forward receivable vs a counterparty whose currency is
        # the foreign one: positive rate correlation changes EPE — the
        # deterministic-rate model sees NO effect. CRN comparison.
        from finmath_tpu.models.lmm.hybrid import EquityForwardTrade
        from finmath_tpu.models.lmm.exposure import cva_from_profile

        tf = np.linspace(0, 5, 11)
        fc_f = DiscountCurve(list(tf[1:]), list(np.exp(-0.02 * tf[1:])))
        cvas = []
        for rho in (-0.6, 0.6):
            model = build_model()
            h = HybridAssetLMM(model, [1.25], [0.10],
                               rate_correlations=[rho],
                               dividend_yields=[fc_f],
                               num_paths=60_000, num_factors=1, seed=47,
                               antithetic=True)
            from finmath_tpu.models.lmm.hybrid import HybridExposureEngine
            eng = HybridExposureEngine(
                h, [EquityForwardTrade(0, 8, 1.20)])
            prof = eng.profile(P0)
            cvas.append(cva_from_profile(prof, hazard_rate=0.02))
        assert cvas[0] != cvas[1]
        assert all(c > 0.0 for c in cvas)

    def test_validation(self):
        from finmath_tpu.models.lmm.hybrid import (
            EquityForwardTrade, HybridExposureEngine)

        model = build_model()
        tf = np.linspace(0, 5, 11)
        fc_f = DiscountCurve(list(tf[1:]), list(np.exp(-0.02 * tf[1:])))
        h = HybridAssetLMM(model, [1.25, 80.0], [0.12, 0.25],
                           dividend_yields=[fc_f, 0.0],
                           growth_curves=[None, fc_f],
                           quanto_fx_indices=[None, 0],
                           num_paths=4_000, num_factors=1)
        with pytest.raises(ValueError, match="quanto"):
            HybridExposureEngine(h, [EquityForwardTrade(1, 6, 80.0)])
        with pytest.raises(ValueError, match="observation"):
            HybridExposureEngine(h, [EquityForwardTrade(0, 10, 1.2)])
        with pytest.raises(ValueError):
            HybridExposureEngine(h, [])


class TestHybridAutocallable:
    def _note(self, model, **kw):
        from finmath_tpu.models.lmm.hybrid import HybridAutocallableNote

        defaults = dict(num_paths=120_000, seed=53, antithetic=True)
        defaults.update({k: kw.pop(k) for k in list(kw)
                         if k in ("num_paths", "seed", "rho")})
        rho = defaults.pop("rho", 0.0)
        h = HybridAssetLMM(model, [100.0], [0.25], rate_correlations=[rho],
                           **defaults)
        return h, HybridAutocallableNote(h, **kw)

    def test_deterministic_limit_matches_express_closed_form(self):
        from finmath_tpu.models.structured_products import (
            autocallable_value_single_observation)

        model = build_model(sigma_l=1e-12)
        # two dates: T1 = 0.5 (index 1), T = 1.0 (index 2)
        h, note = self._note(model, observation_indices=[1, 2],
                             autocall_levels=[105.0, 100.0],
                             coupons=[0.05, 0.08], protection_level=70.0)
        v, e = note.get_value_and_error(P0)
        # deterministic short rate from the curve: value the closed form
        # with the curve's own discounting via an equivalent flat r on
        # each interval — the closed form takes one r, so use the exact
        # df-matching rate over [0, T]
        t1, t = 0.5, 1.0
        df1 = float(DC.get_discount_factor(t1))
        df2 = float(DC.get_discount_factor(t))
        # the closed form assumes constant r; the curve here is nearly
        # flat (4.5-4.7%): use r from df(T) and allow the small mismatch
        r = -math.log(df2) / t
        an = autocallable_value_single_observation(
            100.0, r, 0.25, t1, t, autocall_level=105.0, coupon1=0.05,
            final_coupon_level=100.0, final_coupon=0.08,
            protection_level=70.0)
        assert abs(v - an) < 4 * e + 2e-3

    def test_equity_rate_correlation_moves_the_value(self):
        # the hybrid-only effect: coupon/redemption cash flows arrive
        # when the pathwise discount factor is correlated-high or -low,
        # so the note value depends on the equity-rate correlation.
        # Common random numbers (same seed) make the ordering sharp
        # (measured ~6 sigma between rho = +-0.5 at 120k paths).
        kwargs = dict(observation_indices=[1, 2, 3, 4, 5, 6],
                      autocall_levels=[110.0] * 6,
                      coupon_levels=[85.0] * 6,
                      coupons=[0.02] * 6, protection_level=60.0,
                      memory=True)
        model = build_model()
        vals, errs = [], []
        for rho in (-0.5, 0.0, 0.5):
            _, note = self._note(model, rho=rho, **kwargs)
            v, e = note.get_value_and_error(P0)
            vals.append(v)
            errs.append(e)
        assert vals[0] < vals[1] < vals[2]
        assert vals[2] - vals[0] > 2 * (errs[0] + errs[2])

    def test_memory_dominates(self):
        model = build_model()
        kwargs = dict(observation_indices=[1, 2, 3, 4],
                      autocall_levels=[115.0] * 4,
                      coupon_levels=[90.0] * 4,
                      coupons=[0.02] * 4, protection_level=60.0)
        _, n_mem = self._note(model, memory=True, **kwargs)
        _, n_no = self._note(model, memory=False, **kwargs)
        assert n_mem.get_value(P0) >= n_no.get_value(P0) - 1e-9

    def test_validation(self):
        from finmath_tpu.models.lmm.hybrid import HybridAutocallableNote

        model = build_model()
        h = HybridAssetLMM(model, [100.0], [0.2], num_paths=4_000)
        with pytest.raises(ValueError):
            HybridAutocallableNote(h, [2, 1], [1.0, 1.0], [0.0, 0.0], 0.6)
        with pytest.raises(ValueError):
            HybridAutocallableNote(h, [1, 99], [1.0, 1.0], [0.0, 0.0], 0.6)
        with pytest.raises(ValueError):
            HybridAutocallableNote(h, [1, 2], [1.0], [0.0, 0.0], 0.6)


class TestHybridMesh:
    """Path-axis sharding of the hybrid over the 8-virtual-device mesh."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:8])
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        return Mesh(devs, ("paths",))

    def test_martingale_and_option_on_mesh(self, mesh):
        h = HybridAssetLMM(build_model(), [100.0], [0.20],
                           rate_correlations=[0.4], num_paths=64_000,
                           num_factors=1, seed=11, antithetic=True,
                           mesh=mesh)
        errs = h.martingale_errors(P0)
        assert np.nanmax(np.abs(errs)) < 0.02
        v_m, se_m = h.european_option_value(P0, 6, 105.0)
        h_u = HybridAssetLMM(build_model(), [100.0], [0.20],
                             rate_correlations=[0.4], num_paths=64_000,
                             num_factors=1, seed=11, antithetic=True)
        v_u, se_u = h_u.european_option_value(P0, 6, 105.0)
        # different per-device streams -> statistical agreement only
        assert abs(v_m - v_u) < 4 * (se_m + se_u)

    def test_exposure_profile_on_mesh(self, mesh):
        from finmath_tpu.models.lmm.hybrid import (
            EquityForwardTrade, EquityOptionTrade, HybridExposureEngine)

        h = HybridAssetLMM(build_model(), [100.0], [0.20],
                           rate_correlations=[0.3], num_paths=32_000,
                           num_factors=1, seed=41, antithetic=True,
                           mesh=mesh)
        eng = HybridExposureEngine(h, [EquityForwardTrade(0, 8, 100.0),
                                       EquityOptionTrade(0, 6, 110.0)])
        prof = eng.profile(P0)
        assert np.allclose(prof.ee + prof.ene, prof.forward_value,
                           atol=1e-10)
        assert np.all(np.isfinite(prof.ee)) and np.all(prof.ee >= 0.0)
        # exposure accumulates with horizon while BOTH trades are live
        # (after the option expires at index 6 the netting set sheds its
        # option value and EE steps down — same shape as unmeshed)
        t_exp = TD.get_time(6)
        pre = prof.times <= t_exp - 1e-9
        assert prof.ee[pre][-1] > prof.ee[pre][0]

    def test_autocallable_on_mesh(self, mesh):
        from finmath_tpu.models.lmm.hybrid import HybridAutocallableNote

        h = HybridAssetLMM(build_model(), [100.0], [0.25],
                           rate_correlations=[0.3], num_paths=32_000,
                           num_factors=1, seed=53, antithetic=True,
                           mesh=mesh)
        note = HybridAutocallableNote(h, [1, 2], [105.0, 100.0],
                                      [0.05, 0.08], 70.0)
        v, e = note.get_value_and_error(P0)
        assert 0.8 < v < 1.2 and e > 0.0
