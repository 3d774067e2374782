"""Caplet-volatility stripping (finmath_tpu/models/caps.py).

Oracles: exact round-trips (piecewise-constant synthetic caplet vols ->
cap prices -> strip -> recover to 1e-9), flat-vol fixed point, the
flat-vol/price quote equivalence, normal-convention stripping, a full
surface column-by-column, arbitrage-violation errors — and end-to-end,
a lognormal LMM driven by the stripped curve reprices the input caps
by Monte Carlo on the valuation engine."""

import numpy as np
import pytest

from finmath_tpu.models.caps import (
    CapletVolatilityCurve,
    LIBORVolatilityModelFromCapletCurve,
    cap_value,
    implied_flat_cap_volatility,
    make_cap_schedule,
    strip_caplet_surface,
    strip_caplet_volatilities,
)
from finmath_tpu.models.curves import DiscountCurve, ForwardCurve

PERIOD = 0.5
PILLARS = [0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 12.0]
ZEROS = [0.015, 0.017, 0.020, 0.022, 0.025, 0.027, 0.029, 0.030]
DC = DiscountCurve(PILLARS, list(np.exp(-np.array(ZEROS) * np.array(PILLARS))))
FC = ForwardCurve(DC, payment_offset=PERIOD)
MATURITIES = np.array([1.0, 2.0, 3.0, 5.0, 7.0, 10.0])
SEG_VOLS = np.array([0.45, 0.38, 0.31, 0.26, 0.23, 0.21])  # decaying hump tail
STRIKE = 0.03


def _prices_from_segments(curve, strike, convention="lognormal"):
    out = []
    for m in MATURITIES:
        fx = make_cap_schedule(float(m), PERIOD)
        vols = curve.get_caplet_volatility(fx)
        out.append(cap_value(DC, FC, fx, PERIOD, strike, vols, convention))
    return np.asarray(out)


class TestSchedule:
    def test_standard_schedule(self):
        fx = make_cap_schedule(2.0, 0.5)
        assert np.allclose(fx, [0.5, 1.0, 1.5])

    def test_unreachable_maturity_rejected(self):
        with pytest.raises(ValueError):
            make_cap_schedule(2.3, 0.5)


class TestCapValue:
    def test_cap_floor_parity(self):
        fx = make_cap_schedule(5.0, PERIOD)
        cap = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.3)
        floor = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.3, is_cap=False)
        fwds = np.asarray(FC.get_forward(fx))
        dfs = DC.get_discount_factor(fx + PERIOD)
        swap = float(np.sum(PERIOD * (fwds - STRIKE) * dfs))
        assert cap - floor == pytest.approx(swap, abs=1e-12)

    def test_normal_equals_lognormal_at_matched_caplet_prices(self):
        # sanity: both conventions produce positive, vol-monotone values
        fx = make_cap_schedule(3.0, PERIOD)
        lo = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.2)
        hi = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.4)
        assert 0.0 < lo < hi
        lo_n = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.004, "normal")
        hi_n = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.009, "normal")
        assert 0.0 < lo_n < hi_n

    def test_implied_flat_vol_round_trip(self):
        fx = make_cap_schedule(5.0, PERIOD)
        price = cap_value(DC, FC, fx, PERIOD, STRIKE, 0.2873)
        iv = implied_flat_cap_volatility(price, DC, FC, fx, PERIOD, STRIKE)
        assert iv == pytest.approx(0.2873, abs=1e-9)

    def test_below_intrinsic_rejected(self):
        fx = make_cap_schedule(5.0, PERIOD)
        with pytest.raises(ValueError):
            implied_flat_cap_volatility(1e-9, DC, FC, fx, PERIOD, 0.001)


class TestStripping:
    def test_exact_round_trip_from_price_quotes(self):
        truth = CapletVolatilityCurve(MATURITIES, SEG_VOLS)
        prices = _prices_from_segments(truth, STRIKE)
        stripped = strip_caplet_volatilities(
            DC, FC, MATURITIES, prices, STRIKE, PERIOD, quote_type="price")
        assert np.allclose(stripped.volatilities, SEG_VOLS, atol=1e-9)

    def test_exact_round_trip_from_flat_vol_quotes(self):
        truth = CapletVolatilityCurve(MATURITIES, SEG_VOLS)
        prices = _prices_from_segments(truth, STRIKE)
        flats = [
            implied_flat_cap_volatility(
                p, DC, FC, make_cap_schedule(float(m), PERIOD), PERIOD, STRIKE)
            for m, p in zip(MATURITIES, prices)
        ]
        stripped = strip_caplet_volatilities(
            DC, FC, MATURITIES, flats, STRIKE, PERIOD)
        assert np.allclose(stripped.volatilities, SEG_VOLS, atol=1e-8)

    def test_flat_quotes_strip_flat(self):
        stripped = strip_caplet_volatilities(
            DC, FC, MATURITIES, np.full(len(MATURITIES), 0.27), STRIKE,
            PERIOD)
        assert np.allclose(stripped.volatilities, 0.27, atol=1e-9)

    def test_stripped_curve_reprices_every_cap(self):
        # even with NON-flat quotes that don't come from a piecewise-
        # constant truth, the stripped curve must reprice the quotes
        flats = np.array([0.44, 0.41, 0.37, 0.31, 0.27, 0.24])
        stripped = strip_caplet_volatilities(
            DC, FC, MATURITIES, flats, STRIKE, PERIOD)
        for m, fv in zip(MATURITIES, flats):
            fx = make_cap_schedule(float(m), PERIOD)
            target = cap_value(DC, FC, fx, PERIOD, STRIKE, float(fv))
            got = cap_value(DC, FC, fx, PERIOD, STRIKE,
                            stripped.get_caplet_volatility(fx))
            assert got == pytest.approx(target, rel=1e-9)

    def test_normal_convention_round_trip(self):
        seg = np.array([0.0085, 0.0080, 0.0072, 0.0066, 0.0061, 0.0058])
        truth = CapletVolatilityCurve(MATURITIES, seg, convention="normal")
        prices = _prices_from_segments(truth, STRIKE, "normal")
        stripped = strip_caplet_volatilities(
            DC, FC, MATURITIES, prices, STRIKE, PERIOD, convention="normal",
            quote_type="price")
        assert np.allclose(stripped.volatilities, seg, atol=1e-10)

    def test_arbitrage_violation_raises(self):
        truth = CapletVolatilityCurve(MATURITIES, SEG_VOLS)
        prices = _prices_from_segments(truth, STRIKE)
        prices[3] = prices[2] * 0.5  # longer cap cheaper than its front
        with pytest.raises(ValueError, match="arbitrage"):
            strip_caplet_volatilities(DC, FC, MATURITIES, prices, STRIKE,
                                      PERIOD, quote_type="price")

    def test_non_increasing_maturities_rejected(self):
        with pytest.raises(ValueError):
            strip_caplet_volatilities(DC, FC, [1.0, 1.0], [0.3, 0.3],
                                      STRIKE, PERIOD)


class TestSurface:
    def test_column_round_trip(self):
        strikes = [0.02, 0.03, 0.045]
        # smile: higher vols away from ~ATM, per-strike decaying curves
        truths = [CapletVolatilityCurve(MATURITIES, SEG_VOLS * s)
                  for s in (1.12, 1.0, 1.18)]
        quotes = np.column_stack([
            _prices_from_segments(tr, K)
            for tr, K in zip(truths, strikes)
        ])
        curves = strip_caplet_surface(DC, FC, MATURITIES, strikes, quotes,
                                      PERIOD, quote_type="price")
        for curve, truth in zip(curves, truths):
            assert np.allclose(curve.volatilities, truth.volatilities,
                               atol=1e-9)

    def test_shape_mismatch_rejected(self):
        with pytest.raises(ValueError):
            strip_caplet_surface(DC, FC, MATURITIES, [0.02], np.zeros((2, 1)),
                                 PERIOD)


class TestPiecewiseLookup:
    def test_segment_boundaries_belong_right(self):
        # a fixing AT maturity M pays at M+period -> it is in the longer cap
        c = CapletVolatilityCurve([1.0, 2.0], [0.3, 0.2])
        assert c.get_caplet_volatility(0.5) == 0.3
        assert c.get_caplet_volatility(1.0) == 0.2  # at the boundary
        assert c.get_caplet_volatility(1.5) == 0.2
        assert c.get_caplet_volatility(99.0) == 0.2  # constant extrapolation

    def test_validation(self):
        with pytest.raises(ValueError):
            CapletVolatilityCurve([2.0, 1.0], [0.3, 0.2])


class TestLMMEndToEnd:
    def test_mc_cap_reprices_stripped_quotes(self):
        """Lognormal LMM with sigma_i(t) = stripped caplet vol must
        reprice the input caps by MC (each caplet's terminal total
        variance matches by construction)."""
        from finmath_tpu.models.lmm.covariance import (
            LIBORCorrelationModelExponentialDecay,
            LIBORCovarianceModelFromVolatilityAndCorrelation,
        )
        from finmath_tpu.models.lmm.model import LIBORMarketModelTPU
        from finmath_tpu.models.lmm.products import CapFloor
        from finmath_tpu.models.time_discretization import TimeDiscretization

        mats = np.array([1.0, 2.0, 3.0])
        seg = np.array([0.35, 0.29, 0.24])
        truth = CapletVolatilityCurve(mats, seg)
        prices = []
        for m in mats:
            fx = make_cap_schedule(float(m), PERIOD)
            prices.append(cap_value(DC, FC, fx, PERIOD, STRIKE,
                                    truth.get_caplet_volatility(fx)))
        stripped = strip_caplet_volatilities(
            DC, FC, mats, np.asarray(prices), STRIKE, PERIOD,
            quote_type="price")

        libor_td = TimeDiscretization(initial=0.0, num_steps=7, step=PERIOD)
        vol_model = LIBORVolatilityModelFromCapletCurve(
            libor_td, libor_td, stripped)
        cov = LIBORCovarianceModelFromVolatilityAndCorrelation(
            vol_model, LIBORCorrelationModelExponentialDecay(libor_td, 2))
        model = LIBORMarketModelTPU(libor_td, FC, DC, cov,
                                    measure="spot", state_space="lognormal")
        # the 3Y cap = fixings 0.5..2.5 -> indices 1..5 on the tenor grid
        cap = CapFloor(model, 1, 6, STRIKE, num_paths=120_000, seed=7)
        mc = cap.get_value(np.zeros(0))
        assert mc == pytest.approx(prices[-1], rel=0.03)

    def test_normal_curve_rejected(self):
        from finmath_tpu.models.time_discretization import TimeDiscretization

        td = TimeDiscretization(initial=0.0, num_steps=4, step=PERIOD)
        c = CapletVolatilityCurve([1.0], [0.008], convention="normal")
        with pytest.raises(ValueError):
            LIBORVolatilityModelFromCapletCurve(td, td, c)
