"""MonteCarloHestonModel facade tests: the equity product zoo under
stochastic volatility, validated against the characteristic-function
pricer and the EXACT Heston integrated-variance closed form."""

import math

import numpy as np
import pytest

from finmath_tpu.models.black_scholes import EuropeanOption
from finmath_tpu.models.equity_products import (
    AsianOption,
    BarrierOption,
    DigitalOption,
    LookbackOption,
)
from finmath_tpu.models.hedging import VarianceSwap
from finmath_tpu.models.heston import (
    HestonModel,
    HestonParams,
    MonteCarloHestonModel,
    heston_characteristic_prices,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, T = 100.0, 0.03, 1.0
P = HestonParams(S0, R, v0=0.04, kappa=1.5, theta=0.05, xi=0.4,
                 rho=-0.6)
N_STEPS, N_PATHS = 100, 200_000


@pytest.fixture(scope="module")
def sim():
    td = TimeDiscretization(initial=0.0, num_steps=N_STEPS,
                            step=T / N_STEPS)
    return MonteCarloHestonModel(td, N_PATHS, P, seed=17)


class TestFacade:
    def test_european_matches_characteristic_function(self, sim):
        ks = np.array([90.0, 100.0, 110.0])
        cf = heston_characteristic_prices(P, T, ks)
        for k, ref in zip(ks, cf):
            v = EuropeanOption(T, float(k)).get_value(sim)
            # MC error + full-truncation Euler bias at dt = 0.01
            assert abs(v - ref) < 0.015 * ref + 0.08

    def test_martingale(self, sim):
        fwd = float(sim.get_asset_value(T).get_average())
        assert abs(fwd - S0 * math.exp(R * T)) < 0.35   # ~3 MC sigma

    def test_variance_path_accessor(self, sim):
        v = np.asarray(sim.get_asset_values([0.5, T], asset_index=1),
                       dtype=np.float64)
        # full truncation lets v dip slightly negative pathwise, but
        # the mean must track the CIR expectation
        for t, row in zip([0.5, T], v):
            expect = P.theta + (P.v0 - P.theta) * math.exp(-P.kappa * t)
            assert abs(np.maximum(row, 0.0).mean() - expect) \
                < 0.02 * expect + 2e-3

    def test_variance_swap_matches_cir_integral(self, sim):
        # E[(1/T) int_0^T v dt] = theta + (v0-theta)(1-e^{-kT})/(kT),
        # exact for Heston; realized log-return variance adds O(dt)
        k = VarianceSwap(T).fair_strike(sim)
        expect = P.theta + (P.v0 - P.theta) \
            * (1.0 - math.exp(-P.kappa * T)) / (P.kappa * T)
        assert abs(k - expect) < 0.03 * expect

    def test_digital_cash_parity(self, sim):
        c, _ = DigitalOption(T, 100.0).get_value_and_error(sim)
        p, _ = DigitalOption(T, 100.0, is_call=False) \
            .get_value_and_error(sim)
        assert abs(c + p - math.exp(-R * T)) < 1e-9

    def test_barrier_in_out_parity_same_stream(self, sim):
        vi, _ = BarrierOption(T, 100.0, 130.0, "up-in") \
            .get_value_and_error(sim)
        vo, _ = BarrierOption(T, 100.0, 130.0, "up-out") \
            .get_value_and_error(sim)
        ve = EuropeanOption(T, 100.0).get_value(sim)
        assert abs(vi + vo - ve) < 1e-6 * ve

    def test_bridge_correction_rejected(self, sim):
        # the Brownian-bridge crossing law is lognormal-only
        with pytest.raises(NotImplementedError):
            BarrierOption(T, 100.0, 130.0, "up-out",
                          monitoring="bridge").get_value(sim)

    def test_asian_below_european(self, sim):
        times = [round((i + 1) * T / 10, 10) for i in range(10)]
        va, _ = AsianOption(times, 100.0).get_value_and_error(sim)
        ve = EuropeanOption(T, 100.0).get_value(sim)
        assert va < ve        # averaging reduces optionality

    def test_lookback_dominates_european(self, sim):
        v, _ = LookbackOption(T, "floating-call").get_value_and_error(sim)
        ve = EuropeanOption(T, S0).get_value(sim)
        assert v >= ve

    def test_negative_skew_in_digitals(self, sim):
        # rho < 0: fat left tail -> OTM put digitals richer than the
        # lognormal with the same ATM vol would price... assert the
        # weaker model-free fact P(S_T < 70) > 0 measurably
        p, _ = DigitalOption(T, 70.0, is_call=False) \
            .get_value_and_error(sim)
        assert p > 0.005

    def test_off_grid_time_raises(self, sim):
        with pytest.raises(ValueError):
            sim.get_asset_value(T + 0.177)

    def test_accepts_model_object(self):
        td = TimeDiscretization(initial=0.0, num_steps=4, step=0.25)
        m = MonteCarloHestonModel(td, 1_000, HestonModel(P), seed=3)
        assert m.get_number_of_paths() == 1_000
