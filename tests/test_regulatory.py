"""SA-CCR / capital / KVA tests — closed-form regulatory arithmetic
checked against hand-computed values (BCBS 279 worked formulas), plus one
integration pass on a real LMM exposure profile."""

import numpy as np
import pytest
from types import SimpleNamespace

from finmath_tpu.models.regulatory import (
    ALPHA,
    IR_SUPERVISORY_FACTOR,
    SACCRTrade,
    ccr_capital_profile,
    cva_capital,
    cva_capital_profile,
    kva,
    kva_from_capital_profile,
    saccr_addon,
    saccr_ead,
    saccr_ead_profile,
    saccr_multiplier,
    supervisory_option_delta,
)


def sd(s, e):
    return (np.exp(-0.05 * s) - np.exp(-0.05 * e)) / 0.05


class TestSACCRAddOn:
    def test_single_swap_hand_computed(self):
        """10y running payer swap, notional 1e6, unmargined: MF = 1,
        AddOn = 0.5% x N x SD(0, 10)."""
        tr = SACCRTrade(1e6, 0.0, 10.0)
        expected = IR_SUPERVISORY_FACTOR * 1e6 * sd(0.0, 10.0)
        assert saccr_addon([tr]) == pytest.approx(expected, rel=1e-12)

    def test_short_maturity_factor(self):
        """End 0.5y: MF = sqrt(0.5) (unmargined, floored at 10 business
        days)."""
        tr = SACCRTrade(1e6, 0.0, 0.5)
        expected = IR_SUPERVISORY_FACTOR * 1e6 * sd(0.0, 0.5) * np.sqrt(0.5)
        assert saccr_addon([tr]) == pytest.approx(expected, rel=1e-12)

    def test_margined_maturity_factor(self):
        """Margined: MF = 1.5 sqrt(MPOR), independent of maturity."""
        tr = SACCRTrade(1e6, 0.0, 10.0)
        mpor = 10.0 / 250.0
        expected = IR_SUPERVISORY_FACTOR * 1e6 * sd(0.0, 10.0) \
            * 1.5 * np.sqrt(mpor)
        assert saccr_addon([tr], margined=True) == pytest.approx(
            expected, rel=1e-12)

    def test_same_bucket_offsets(self):
        """Payer + receiver of the same swap net to zero add-on."""
        a = SACCRTrade(1e6, 0.0, 10.0, delta=+1.0)
        b = SACCRTrade(1e6, 0.0, 10.0, delta=-1.0)
        assert saccr_addon([a, b]) == pytest.approx(0.0, abs=1e-9)

    def test_cross_bucket_correlation(self):
        """Buckets 1 (<1y) and 3 (>5y) aggregate with the 0.6 cross
        term."""
        a = SACCRTrade(1e6, 0.0, 0.5, delta=+1.0)
        b = SACCRTrade(1e6, 0.0, 10.0, delta=-1.0)
        d1 = 1e6 * sd(0.0, 0.5) * np.sqrt(0.5)
        d3 = -1e6 * sd(0.0, 10.0)
        en = np.sqrt(d1 * d1 + d3 * d3 + 0.6 * d1 * d3)
        assert saccr_addon([a, b]) == pytest.approx(
            IR_SUPERVISORY_FACTOR * en, rel=1e-12)

    def test_hedging_sets_do_not_offset(self):
        """Opposite trades in different currencies ADD, same currency
        cancels."""
        usd = SACCRTrade(1e6, 0.0, 10.0, delta=+1.0, hedging_set="USD")
        eur = SACCRTrade(1e6, 0.0, 10.0, delta=-1.0, hedging_set="EUR")
        single = saccr_addon([SACCRTrade(1e6, 0.0, 10.0)])
        assert saccr_addon([usd, eur]) == pytest.approx(2 * single,
                                                        rel=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError):
            SACCRTrade(-1.0, 0.0, 10.0)
        with pytest.raises(ValueError):
            SACCRTrade(1.0, 5.0, 5.0)
        with pytest.raises(ValueError):
            saccr_addon([])


class TestMultiplierAndEAD:
    def test_multiplier_one_at_nonnegative_mtm(self):
        assert saccr_multiplier(0.0, 0.0, 100.0) == 1.0
        assert saccr_multiplier(50.0, 0.0, 100.0) == 1.0

    def test_multiplier_dampens_negative_mtm(self):
        m = saccr_multiplier(-100.0, 0.0, 100.0)
        expected = 0.05 + 0.95 * np.exp(-100.0 / (2 * 0.95 * 100.0))
        assert m == pytest.approx(expected, rel=1e-12)
        assert 0.05 < m < 1.0

    def test_multiplier_floor(self):
        assert saccr_multiplier(-1e9, 0.0, 1.0) == pytest.approx(0.05)

    def test_collateral_shifts_the_multiplier(self):
        assert saccr_multiplier(0.0, 50.0, 100.0) < 1.0

    def test_ead_hand_computed(self):
        """V = 2000, no collateral: EAD = 1.4 (RC + AddOn)."""
        tr = SACCRTrade(1e6, 0.0, 10.0)
        addon = IR_SUPERVISORY_FACTOR * 1e6 * sd(0.0, 10.0)
        assert saccr_ead(2000.0, [tr]) == pytest.approx(
            ALPHA * (2000.0 + addon), rel=1e-12)

    def test_margined_rc_floor(self):
        """Margined RC floors at TH + MTA - NICA even when V - C < it."""
        tr = SACCRTrade(1e6, 0.0, 10.0)
        e = saccr_ead(0.0, [tr], margined=True, threshold=500.0,
                      mta=100.0)
        addon = saccr_addon([tr], margined=True)
        assert e == pytest.approx(ALPHA * (600.0 + addon), rel=1e-12)


class TestSupervisoryDelta:
    def test_atm_call(self):
        d = supervisory_option_delta(0.03, 0.03, 1.0)
        from statistics import NormalDist
        assert d == pytest.approx(NormalDist().cdf(0.25), rel=1e-12)

    def test_call_put_parity_of_deltas(self):
        """Long call delta - long put delta = 1 (Black deltas)."""
        c = supervisory_option_delta(0.03, 0.025, 2.0, call=True)
        p = supervisory_option_delta(0.03, 0.025, 2.0, call=False)
        assert c - p == pytest.approx(1.0, rel=1e-12)

    def test_short_flips_the_sign(self):
        c = supervisory_option_delta(0.03, 0.025, 2.0, long=True)
        s = supervisory_option_delta(0.03, 0.025, 2.0, long=False)
        assert s == pytest.approx(-c, rel=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError):
            supervisory_option_delta(-0.01, 0.02, 1.0)
        with pytest.raises(ValueError):
            supervisory_option_delta(0.02, 0.02, 0.0)


class TestProfilesAndKVA:
    def _fake_profile(self):
        return SimpleNamespace(
            times=np.array([0.5, 1.0, 1.5, 2.0, 2.5]),
            forward_value=np.array([100.0, 80.0, -50.0, 20.0, 10.0]))

    def test_ead_profile_ages_and_matures(self):
        prof = self._fake_profile()
        trades = [SACCRTrade(1e5, 0.0, 2.0)]
        ead = saccr_ead_profile(prof, trades)
        assert ead[0] > 0.0
        # aged add-on shrinks as the swap rolls down
        assert ead[1] < ead[0]
        # matured at t >= 2.0: no trades left
        assert ead[3] == 0.0 and ead[4] == 0.0
        # negative forward value: RC = 0, multiplier < 1 but EAD > 0
        aged = [SACCRTrade(1e5, 0.0, 0.5)]
        assert ead[2] == pytest.approx(
            saccr_ead(-50.0, aged), rel=1e-12)

    def test_ccr_capital_is_linear(self):
        ead = np.array([100.0, 50.0])
        cap = ccr_capital_profile(ead, risk_weight=0.5)
        assert np.allclose(cap, 0.08 * 0.5 * ead)

    def test_cva_capital_hand_computed(self):
        """Single counterparty, no hedges: K = 2.33 w M EAD_disc."""
        m, eadv, w = 5.0, 1000.0, 0.01
        ead_d = eadv * (1 - np.exp(-0.05 * m)) / (0.05 * m)
        assert cva_capital(eadv, m, w) == pytest.approx(
            2.33 * w * m * ead_d, rel=1e-12)

    def test_cva_capital_profile_dies_at_maturity(self):
        prof = self._fake_profile()
        ead = np.array([100.0, 100.0, 100.0, 0.0, 0.0])
        cap = cva_capital_profile(ead, prof.times, maturity=2.0)
        assert cap[0] > cap[1] > cap[2] > 0.0
        assert cap[3] == 0.0

    def test_kva_rectangle_rule(self):
        t = np.array([0.5, 1.0])
        k = np.array([1.0, 1.0])
        assert kva_from_capital_profile(t, k, cost_of_capital=0.10) \
            == pytest.approx(0.10 * 1.0, rel=1e-12)

    def test_kva_survival_and_discount_reduce(self):
        t = np.array([0.5, 1.0])
        k = np.array([1.0, 1.0])
        base = kva_from_capital_profile(t, k)
        assert kva_from_capital_profile(
            t, k, counterparty_hazard_rate=0.05) < base
        assert kva_from_capital_profile(t, k, discount_rate=0.05) < base

    def test_one_call_kva(self):
        prof = self._fake_profile()
        trades = [SACCRTrade(1e5, 0.0, 2.5)]
        v = kva(prof, trades, counterparty_hazard_rate=0.02)
        assert np.isfinite(v) and v > 0.0
        # CVA capital only adds
        assert v > kva(prof, trades, include_cva_capital=False,
                       counterparty_hazard_rate=0.02)

    def test_validation(self):
        with pytest.raises(ValueError):
            kva_from_capital_profile(np.array([1.0]), np.array([1.0, 2.0]))
        with pytest.raises(ValueError):
            ccr_capital_profile(np.array([1.0]), risk_weight=-1.0)
        with pytest.raises(ValueError):
            cva_capital(100.0, 0.0)


class TestIntegrationWithExposureEngine:
    def test_kva_on_a_real_lmm_profile(self):
        """End-to-end: LMM swap exposure profile -> SA-CCR EAD ->
        capital -> KVA, with the trade descriptor matching the model's
        tenor grid."""
        from finmath_tpu.models.lmm.atm_calibration import (
            build_atm_calibration)
        from finmath_tpu.models.lmm.exposure import SwapExposureEngine

        setup = build_atm_calibration(num_paths=2000, num_factors=1)
        eng = SwapExposureEngine(
            setup.model, first_index=1, last_index=10, strike=0.01,
            num_paths=2000, num_factors=1, seed=3)
        prof = eng.profile(setup.covariance.initial_parameters)
        tenor = setup.model.tenor_times
        trades = [SACCRTrade(1.0, float(tenor[1]), float(tenor[10]))]
        ead = saccr_ead_profile(prof, trades)
        assert ead[0] > 0.0 and np.all(np.isfinite(ead))
        v = kva(prof, trades, counterparty_hazard_rate=0.02)
        assert np.isfinite(v) and v > 0.0
