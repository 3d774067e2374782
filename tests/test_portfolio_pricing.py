"""price_portfolio (models/equity_products.py): a whole product book in
ONE packed host transfer must reproduce the per-product
get_value_and_error results exactly (same kernels, same paths — only the
transfer pattern changes). Works across facades and product families
(equity exotics, EuropeanOption, the Hull-White TARN/Bermudan book)."""

import numpy as np
import pytest

from finmath_tpu.models import (AsianOption, BarrierOption, DigitalOption,
                                LookbackOption, price_portfolio)
from finmath_tpu.models.black_scholes import (BlackScholesModel,
                                              EuropeanOption,
                                              MonteCarloBlackScholesModel)
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import (HullWhiteModel,
                                           HullWhiteSimulation)
from finmath_tpu.models.hw_bermudan import BermudanSwaption
from finmath_tpu.models.tarn import TargetRedemptionNote
from finmath_tpu.models.time_discretization import TimeDiscretization

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def bs_sim():
    td = TimeDiscretization(initial=0.0, num_steps=10, step=0.1)
    return MonteCarloBlackScholesModel(
        td, 20_000, BlackScholesModel(100.0, 0.05, 0.3), seed=5)


def _equity_book():
    return [
        EuropeanOption(1.0, 105.0),
        EuropeanOption(1.0, 95.0, is_call=False),
        DigitalOption(1.0, 100.0),
        AsianOption([0.2, 0.4, 0.6, 0.8, 1.0], 100.0),
        BarrierOption(1.0, 100.0, 130.0, "up-out"),
        BarrierOption(1.0, 100.0, 80.0, "down-in", is_call=False),
        LookbackOption(1.0, "floating-call"),
        LookbackOption(1.0, "fixed-put", strike=100.0),
    ]


class TestEquityPortfolio:
    def test_matches_per_product_values(self, bs_sim):
        book = _equity_book()
        packed = price_portfolio(bs_sim, book)
        assert len(packed) == len(book)
        for (v, e), p in zip(packed, book):
            v1, e1 = p.get_value_and_error(bs_sim)
            assert v == pytest.approx(v1, abs=1e-12), type(p).__name__
            assert e == pytest.approx(e1, abs=1e-12), type(p).__name__

    def test_empty_book(self, bs_sim):
        assert price_portfolio(bs_sim, []) == []


class TestRatesPortfolio:
    def test_hw_book_matches(self):
        t = np.arange(0.0, 21.0)
        dc = DiscountCurve(t, np.exp(-0.03 * t))
        hw = HullWhiteModel(dc, mean_reversion=0.1, volatility=0.01)
        td = TimeDiscretization(initial=0.0, num_steps=16, step=0.5)
        sim = HullWhiteSimulation(hw, td, num_paths=20_000, seed=11,
                                  antithetic=True)
        book = [
            TargetRedemptionNote([1.0, 2.0, 3.0], [1.5, 2.5, 3.5],
                                 strike=0.06, target=0.06, multiplier=2.0),
            BermudanSwaption([1.0, 2.0, 3.0], 6.0, 0.03),
            BermudanSwaption([2.0, 3.0], 6.0, 0.025, payer=False),
        ]
        packed = price_portfolio(sim, book)
        for (v, e), p in zip(packed, book):
            v1, e1 = p.get_value_and_error(sim)
            assert v == pytest.approx(v1, abs=1e-12), type(p).__name__
            assert e == pytest.approx(e1, abs=1e-12), type(p).__name__
