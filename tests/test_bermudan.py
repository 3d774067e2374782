"""Bermudan swaption (Longstaff-Schwartz) tests — a capability the
reference's device class lacks entirely (choose returns null,
RandomVariableCuda.java:1631-1635)."""

import numpy as np
import pytest

from finmath_tpu.models.curves import par_swap_rate
from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
from finmath_tpu.models.lmm.bermudan import BermudanSwaption, BermudanSwaptionPricer
from finmath_tpu.models.lmm.model import LMMValuationEngine, SwaptionProduct

N_PATHS = 4000


@pytest.fixture(scope="module")
def setup():
    return build_atm_calibration(num_paths=N_PATHS, num_factors=1)


class TestBermudanSwaption:
    def test_single_exercise_equals_european(self, setup):
        model = setup.model
        p0 = setup.covariance.initial_parameters
        tenor = model.tenor_times
        e, m = 10, 10  # 5Y expiry into a 5Y swap
        strike = par_swap_rate(model.forward_curve, model.discount_curve,
                               tenor[e : e + m + 1])
        engine = LMMValuationEngine(
            model, [SwaptionProduct(e, m, strike, 0.0, value_unit="VALUE")],
            N_PATHS, 1,
        )
        european = engine.values(p0)[0]
        pricer = BermudanSwaptionPricer(
            model, BermudanSwaption((e,), e + m, strike), N_PATHS, 1
        )
        assert pricer.get_value(p0) == pytest.approx(european, abs=3e-4)

    def test_more_exercise_rights_worth_more(self, setup):
        model = setup.model
        p0 = setup.covariance.initial_parameters
        tenor = model.tenor_times
        e, m = 10, 10
        strike = par_swap_rate(model.forward_curve, model.discount_curve,
                               tenor[e : e + m + 1])
        v1 = BermudanSwaptionPricer(
            model, BermudanSwaption((e,), e + m, strike), N_PATHS, 1
        ).get_value(p0)
        v4 = BermudanSwaptionPricer(
            model, BermudanSwaption((e, e + 2, e + 4, e + 6), e + m, strike),
            N_PATHS, 1,
        ).get_value(p0)
        assert v4 >= v1 - 1e-4

    def test_invalid_exercise_after_maturity(self, setup):
        with pytest.raises(ValueError):
            BermudanSwaption((12,), 12, 0.01)

    def test_deterministic(self, setup):
        model = setup.model
        p0 = setup.covariance.initial_parameters
        pricer = BermudanSwaptionPricer(
            model, BermudanSwaption((4, 6), 12, 0.01), N_PATHS, 1
        )
        assert pricer.get_value(p0) == pricer.get_value(p0)

    def test_terminal_measure_rejected(self, setup):
        """The backward induction discounts by the rolling spot account;
        under the terminal measure N stays 1.0 and the price would come
        out silently undiscounted — must refuse instead."""
        from finmath_tpu.models.lmm.model import LIBORMarketModelTPU

        m = setup.model
        terminal = LIBORMarketModelTPU(
            m.libor_td, m.forward_curve, m.discount_curve, m.covariance,
            measure="terminal")
        with pytest.raises(NotImplementedError, match="spot"):
            BermudanSwaptionPricer(
                terminal, BermudanSwaption((4, 6), 12, 0.01), N_PATHS, 1)

    def test_deep_otm_bermudan_nonnegative(self, setup):
        """ITM-restriction regression: without the (immediate > 0) guard
        a regression artifact can lock in negative exercise values and a
        deep-OTM Bermudan can price negative; option value is >= 0."""
        model = setup.model
        p0 = setup.covariance.initial_parameters
        pricer = BermudanSwaptionPricer(
            model, BermudanSwaption((4, 6, 8), 12, 0.15), N_PATHS, 1
        )
        v = pricer.get_value(p0)
        assert v >= 0.0
