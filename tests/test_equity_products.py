"""Equity product zoo tests (finmath_tpu/models/equity_products.py):
digital, Asian, barrier, lookback — each MC product cross-validated
against its independent closed form in models/analytic.py and through
exact pathwise no-arbitrage identities on the SAME path realization
(which hold to f32 rounding, far tighter than MC noise)."""

import math

import numpy as np
import pytest

from finmath_tpu.models.analytic import (
    barrier_option_value,
    black_scholes_option_value,
    digital_option_value,
    geometric_asian_option_value,
    lookback_fixed_strike_value,
    lookback_floating_strike_value,
)
from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    EuropeanOption,
    MonteCarloBlackScholesModel,
)
from finmath_tpu.models.equity_products import (
    AsianOption,
    BarrierOption,
    DigitalOption,
    LookbackOption,
)
from finmath_tpu.models.merton import MertonParams, MonteCarloMertonModel
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N_STEPS = 100
N_PATHS = 100_000
DT = T / N_STEPS
# Broadie-Glasserman-Kou discrete-monitoring scale: the continuous
# extremum overshoots the discrete one by ~beta1*sigma*sqrt(dt) in log
BGK = 0.5826 * SIG * math.sqrt(DT)


@pytest.fixture(scope="module")
def sim():
    td = TimeDiscretization(initial=0.0, num_steps=N_STEPS, step=DT)
    return MonteCarloBlackScholesModel(
        td, N_PATHS, BlackScholesModel(S0, R, SIG), seed=42)


@pytest.fixture(scope="module")
def merton_sim():
    td = TimeDiscretization(initial=0.0, num_steps=20, step=T / 20)
    return MonteCarloMertonModel(
        td, N_PATHS,
        MertonParams(S0, R, 0.2, jump_intensity=0.5,
                     jump_size_mean=-0.1, jump_size_std=0.2), seed=7)


class TestDigital:
    def test_matches_closed_form(self, sim):
        v, e = DigitalOption(T, 105.0).get_value_and_error(sim)
        an = digital_option_value(S0, R, SIG, T, 105.0)
        assert abs(v - an) < 4 * e + 1e-4

    def test_put_matches_closed_form(self, sim):
        v, e = DigitalOption(T, 95.0, is_call=False).get_value_and_error(sim)
        an = digital_option_value(S0, R, SIG, T, 95.0, is_call=False)
        assert abs(v - an) < 4 * e + 1e-4

    def test_call_put_sum_is_cash(self, sim):
        # indicator partition on the same paths: C + P = df exactly
        # (the S_T == K set has measure zero and the > / < split leaves
        # it out of both — use a strike off the f32 grid)
        k = 103.739
        c, _ = DigitalOption(T, k).get_value_and_error(sim)
        p, _ = DigitalOption(T, k, is_call=False).get_value_and_error(sim)
        assert abs(c + p - math.exp(-R * T)) < 1e-9

    def test_merton_facade_cash_parity(self, merton_sim):
        c, _ = DigitalOption(T, 100.0).get_value_and_error(merton_sim)
        p, _ = DigitalOption(T, 100.0, is_call=False) \
            .get_value_and_error(merton_sim)
        assert abs(c + p - math.exp(-R * T)) < 1e-9


class TestAsian:
    times = [round((i + 1) * T / 10 / DT) * DT for i in range(10)]

    def test_geometric_matches_closed_form(self, sim):
        v, e = AsianOption(self.times, 100.0, average="geometric") \
            .get_value_and_error(sim)
        an = geometric_asian_option_value(S0, R, SIG, self.times, 100.0)
        assert abs(v - an) < 4 * e

    def test_geometric_put_matches_closed_form(self, sim):
        v, e = AsianOption(self.times, 100.0, is_call=False,
                           average="geometric").get_value_and_error(sim)
        an = geometric_asian_option_value(S0, R, SIG, self.times, 100.0,
                                          is_call=False)
        assert abs(v - an) < 4 * e

    def test_arithmetic_above_geometric(self, sim):
        # AM-GM pathwise: arithmetic call >= geometric call on the
        # same realization
        va, _ = AsianOption(self.times, 100.0).get_value_and_error(sim)
        vg, _ = AsianOption(self.times, 100.0, average="geometric") \
            .get_value_and_error(sim)
        assert va >= vg

    def test_control_variate_agrees_and_shrinks_error(self, sim):
        va, ea = AsianOption(self.times, 100.0).get_value_and_error(sim)
        vc, ec = AsianOption(self.times, 100.0,
                             control_variate="geometric") \
            .get_value_and_error(sim)
        assert abs(va - vc) < 4 * ea
        assert ec < ea / 5          # measured ~16x under BS

    def test_control_variate_needs_bs(self, merton_sim):
        with pytest.raises(NotImplementedError):
            AsianOption(self.times, 100.0, control_variate="geometric") \
                .get_value(merton_sim)

    def test_merton_facade_plain_runs(self, merton_sim):
        times = [(i + 1) * T / 10 for i in range(10)]
        v, e = AsianOption(times, 100.0).get_value_and_error(merton_sim)
        assert 0.0 < v < S0 and e < 0.2

    def test_validation(self):
        with pytest.raises(ValueError):
            AsianOption([], 100.0)
        with pytest.raises(ValueError):
            AsianOption([0.5, 0.25], 100.0)
        with pytest.raises(ValueError):
            AsianOption([0.5], 100.0, average="median")
        with pytest.raises(ValueError):
            AsianOption([0.5], 100.0, average="geometric",
                        control_variate="geometric")


class TestBarrier:
    CASES = [("up-out", 130.0, 100.0, True), ("down-out", 80.0, 100.0, True),
             ("up-in", 130.0, 100.0, True), ("down-in", 80.0, 100.0, True),
             ("up-out", 130.0, 100.0, False), ("down-in", 90.0, 110.0, False)]

    @pytest.mark.parametrize("bt,b,k,call", CASES)
    def test_bridge_matches_continuous_closed_form(self, sim, bt, b, k, call):
        v, e = BarrierOption(T, k, b, bt, is_call=call,
                             monitoring="bridge").get_value_and_error(sim)
        an = barrier_option_value(S0, R, SIG, T, k, b, bt, call)
        assert abs(v - an) < 4 * e + 1e-3

    @pytest.mark.parametrize("bt,b,k,call", CASES[:4])
    def test_discrete_bias_sign(self, sim, bt, b, k, call):
        # discrete monitoring sees fewer crossings: out-options are
        # worth MORE, in-options LESS than the continuous contract
        v, _ = BarrierOption(T, k, b, bt, is_call=call) \
            .get_value_and_error(sim)
        an = barrier_option_value(S0, R, SIG, T, k, b, bt, call)
        if bt.endswith("out"):
            assert v > an - 1e-3
        else:
            assert v < an + 1e-3

    def test_in_out_parity_same_stream(self, sim):
        # exact pathwise partition: in + out = vanilla on the SAME
        # realization (f64 collection makes it exact to ~1e-12)
        vi, _ = BarrierOption(T, 100.0, 130.0, "up-in") \
            .get_value_and_error(sim)
        vo, _ = BarrierOption(T, 100.0, 130.0, "up-out") \
            .get_value_and_error(sim)
        ve = EuropeanOption(T, 100.0).get_value(sim)
        assert abs(vi + vo - ve) < 1e-6 * ve

    def test_far_barrier_is_european(self, sim):
        v, _ = BarrierOption(T, 100.0, 1e6, "up-out").get_value_and_error(sim)
        ve = EuropeanOption(T, 100.0).get_value(sim)
        assert abs(v - ve) < 1e-6 * ve

    def test_knocked_at_inception(self):
        # spot already beyond the barrier: in == vanilla, out == 0
        an_in = barrier_option_value(S0, R, SIG, T, 100.0, 95.0, "up-in")
        assert abs(an_in - black_scholes_option_value(
            S0, R, SIG, T, 100.0)) < 1e-12
        assert barrier_option_value(S0, R, SIG, T, 100.0, 95.0,
                                    "up-out") == 0.0

    def test_rebate_adds_knock_probability_value(self, sim):
        v0, _ = BarrierOption(T, 100.0, 130.0, "up-out") \
            .get_value_and_error(sim)
        v1, _ = BarrierOption(T, 100.0, 130.0, "up-out", rebate=5.0) \
            .get_value_and_error(sim)
        # rebate value = 5 * df * P(hit); up-in digital-at-maturity
        # consistency: 0 < extra < 5 df
        extra = v1 - v0
        assert 0.0 < extra < 5.0 * math.exp(-R * T)

    def test_bridge_needs_bs(self, merton_sim):
        with pytest.raises(NotImplementedError):
            BarrierOption(T, 100.0, 130.0, "up-out",
                          monitoring="bridge").get_value(merton_sim)

    def test_validation(self):
        with pytest.raises(ValueError):
            BarrierOption(T, 100.0, 130.0, "sideways-out")
        with pytest.raises(ValueError):
            BarrierOption(T, 100.0, 130.0, "up-out", monitoring="hourly")
        with pytest.raises(ValueError):
            barrier_option_value(S0, R, SIG, T, 100.0, 130.0, "bad")


class TestLookback:
    def test_floating_call_below_continuous_within_bgk(self, sim):
        v, e = LookbackOption(T, "floating-call").get_value_and_error(sim)
        an = lookback_floating_strike_value(S0, R, SIG, T, True)
        assert v < an + 4 * e
        assert v > an - 2.5 * BGK * S0 - 4 * e

    def test_floating_put_below_continuous_within_bgk(self, sim):
        v, e = LookbackOption(T, "floating-put").get_value_and_error(sim)
        an = lookback_floating_strike_value(S0, R, SIG, T, False)
        assert v < an + 4 * e
        assert v > an - 2.5 * BGK * S0 - 4 * e

    @pytest.mark.parametrize("k,call", [(110.0, True), (90.0, True),
                                        (90.0, False), (115.0, False)])
    def test_fixed_below_continuous_within_bgk(self, sim, k, call):
        lt = "fixed-call" if call else "fixed-put"
        v, e = LookbackOption(T, lt, strike=k).get_value_and_error(sim)
        an = lookback_fixed_strike_value(S0, R, SIG, T, k, call)
        assert v < an + 4 * e
        assert v > an - 2.5 * BGK * S0 - 4 * e

    def test_fixed_call_itm_decomposition_same_stream(self, sim):
        # pathwise identity for K <= S0 <= max: (max-K)+ = (max-S_T)
        # + (S_T - K), so fixed_call = floating_put + df*mean(S_T)
        # - K df EXACTLY on the same realization (df*mean(S_T) is the
        # zero-strike European, NOT S0 — the martingale identity only
        # holds in expectation)
        k = 90.0
        vf, _ = LookbackOption(T, "fixed-call", strike=k) \
            .get_value_and_error(sim)
        vp, _ = LookbackOption(T, "floating-put").get_value_and_error(sim)
        fwd = EuropeanOption(T, 0.0).get_value(sim)
        expect = vp + fwd - k * math.exp(-R * T)
        assert abs(vf - expect) < 1e-6 * expect

    def test_fixed_put_itm_decomposition_same_stream(self, sim):
        # (K-min)+ = (S_T-min) + (K-S_T) for K >= S0 >= min
        k = 115.0
        vf, _ = LookbackOption(T, "fixed-put", strike=k) \
            .get_value_and_error(sim)
        vc, _ = LookbackOption(T, "floating-call").get_value_and_error(sim)
        fwd = EuropeanOption(T, 0.0).get_value(sim)
        expect = vc + k * math.exp(-R * T) - fwd
        assert abs(vf - expect) < 1e-6 * expect

    def test_floating_call_dominates_atm_european(self, sim):
        # min S <= S0: paying min beats paying S0 pathwise
        v, _ = LookbackOption(T, "floating-call").get_value_and_error(sim)
        ve = EuropeanOption(T, S0).get_value(sim)
        assert v >= ve

    def test_merton_facade_runs(self, merton_sim):
        v, e = LookbackOption(T, "floating-call") \
            .get_value_and_error(merton_sim)
        assert v > 0 and e < 0.3

    def test_validation(self):
        with pytest.raises(ValueError):
            LookbackOption(T, "floating-strangle")
        with pytest.raises(ValueError):
            LookbackOption(T, "fixed-call")          # strike missing
        with pytest.raises(ValueError):
            LookbackOption(T, "floating-call", strike=100.0)


class TestClosedFormInternals:
    def test_barrier_in_out_parity_all_types(self):
        for bt_in, bt_out in (("up-in", "up-out"), ("down-in", "down-out")):
            for call in (True, False):
                for k in (80.0, 100.0, 125.0):
                    b = 130.0 if bt_in.startswith("up") else 75.0
                    vi = barrier_option_value(S0, R, SIG, T, k, b, bt_in,
                                              call)
                    vo = barrier_option_value(S0, R, SIG, T, k, b, bt_out,
                                              call)
                    ve = black_scholes_option_value(S0, R, SIG, T, k, call)
                    assert abs(vi + vo - ve) < 1e-10 * max(ve, 1.0)

    def test_geometric_asian_single_date_is_black_scholes(self):
        # one averaging date == a European option on S(t1)
        an = geometric_asian_option_value(S0, R, SIG, [T], 100.0)
        bs = black_scholes_option_value(S0, R, SIG, T, 100.0)
        assert abs(an - bs) < 1e-12

    def test_lookback_needs_nonzero_rate(self):
        with pytest.raises(ValueError):
            lookback_floating_strike_value(S0, 0.0, SIG, T, True)
        with pytest.raises(ValueError):
            lookback_fixed_strike_value(S0, 0.0, SIG, T, 100.0, True)

    def test_digital_call_put_sum(self):
        c = digital_option_value(S0, R, SIG, T, 100.0)
        p = digital_option_value(S0, R, SIG, T, 100.0, is_call=False)
        assert abs(c + p - math.exp(-R * T)) < 1e-12
