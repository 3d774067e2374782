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
    AutocallableNote,
    autocallable_value_single_observation,
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


class TestAutocallable:
    def test_two_date_express_matches_closed_form(self, sim):
        # single pre-maturity observation at 0.5: exact bivariate form
        note = AutocallableNote(
            observation_dates=[0.5, T],
            autocall_levels=[105.0, 100.0],
            coupons=[0.05, 0.08],
            protection_level=70.0)
        v, e = note.get_value_and_error(sim)
        an = autocallable_value_single_observation(
            S0, R, SIG, 0.5, T, autocall_level=105.0, coupon1=0.05,
            final_coupon_level=100.0, final_coupon=0.08,
            protection_level=70.0)
        assert abs(v - an) < 4 * e + 1e-4

    def test_memory_dominates_no_memory(self, sim):
        dates = [0.2, 0.4, 0.6, T]
        kwargs = dict(
            observation_dates=dates,
            autocall_levels=[110.0] * 4,
            coupon_levels=[90.0] * 4,
            coupons=[0.02] * 4,
            protection_level=60.0)
        v_mem, _ = AutocallableNote(memory=True, **kwargs) \
            .get_value_and_error(sim)
        v_no, _ = AutocallableNote(memory=False, **kwargs) \
            .get_value_and_error(sim)
        assert v_mem >= v_no - 1e-9

    def test_same_stream_numpy_reimplementation(self, sim):
        # independent eager numpy assembly on the SAME asset matrix
        dates = [0.2, 0.4, 0.6, T]
        ac = [108.0, 106.0, 104.0, 1e18]
        cl = [85.0, 85.0, 85.0, 85.0]
        cp = [0.03, 0.03, 0.03, 0.05]
        prot, ref = 65.0, S0
        note = AutocallableNote(dates, ac, cp, prot, coupon_levels=cl,
                                memory=True)
        v, _ = note.get_value_and_error(sim)

        assets = np.asarray(sim.get_asset_values(dates), dtype=np.float64)
        dfs = np.exp(-R * np.asarray(dates))
        alive = np.ones(assets.shape[1])
        mem = np.zeros(assets.shape[1])
        acc = np.zeros(assets.shape[1])
        for i in range(4):
            s_i = assets[i]
            hit = (s_i >= cl[i]).astype(np.float64)
            acc += dfs[i] * alive * hit * (cp[i] + mem)
            mem = np.where(hit > 0, 0.0, mem + cp[i])
            if i < 3:
                call = (s_i >= ac[i]).astype(np.float64)
                acc += dfs[i] * alive * call
                alive *= 1.0 - call
            else:
                acc += dfs[i] * alive * np.where(s_i >= prot, 1.0,
                                                 s_i / ref)
        ref_value = acc.mean()
        # the kernel's coupon/memory leg assembles in f32 (path dtype)
        # before the f64 collection cast: a few f32 ULPs of slack
        assert abs(v - ref_value) < 1e-7 * max(1.0, abs(ref_value))

    def test_full_protection_floors_at_bond(self, sim):
        # protection at 0 never loses principal -> value >= df(T)
        note = AutocallableNote([0.5, T], [1e18, 1e18], [0.0, 0.0],
                                protection_level=0.0)
        v, _ = note.get_value_and_error(sim)
        assert v >= math.exp(-R * T) - 1e-4

    def test_deep_barrier_autocalls_immediately(self, sim):
        # autocall level far below spot: certain call at t1
        note = AutocallableNote([0.2, T], [1e-6, 100.0], [0.04, 0.0],
                                protection_level=50.0)
        v, _ = note.get_value_and_error(sim)
        assert abs(v - 1.04 * math.exp(-R * 0.2)) < 1e-6

    def test_runs_under_heston_and_local_vol(self):
        from finmath_tpu.models.local_vol import (
            LocalVolatilityModel,
            MonteCarloLocalVolModel,
            SSVISurface,
        )
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.05)
        surf = SSVISurface(0.25, 0.22, 2.0, -0.5, 0.4)
        lv = MonteCarloLocalVolModel(
            td, 20_000, LocalVolatilityModel(S0, R, surf, td), seed=5)
        note = AutocallableNote([0.25, 0.5, 0.75, 1.0],
                                [105.0] * 4, [0.02] * 4, 60.0)
        v, _ = note.get_value_and_error(lv)
        assert 0.7 < v < 1.2

    def test_validation(self):
        with pytest.raises(ValueError):
            AutocallableNote([T], [100.0], [0.1], 50.0)
        with pytest.raises(ValueError):
            AutocallableNote([0.5, T], [100.0], [0.1, 0.1], 50.0)
