"""TARN tests (finmath_tpu/models/tarn.py) on the exact Hull-White
simulation: the target = inf limit is a closed-form floorlet portfolio
(put-call parity on the HW analytic caplet), a tiny target degenerates
to the first payment's zero bond, cap conventions are ordered, and an
op-by-op RandomVariable reimplementation on the SAME paths pins the
fused kernel."""

import math

import numpy as np
import pytest

from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import (
    HullWhiteModel,
    HullWhiteSimulation,
)
from finmath_tpu.models.tarn import (
    TargetRedemptionNote,
    inverse_floater_value,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

PILLARS = [0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0]
ZEROS = [0.012, 0.014, 0.017, 0.019, 0.022, 0.024, 0.026]
CURVE = DiscountCurve(PILLARS, list(np.exp(-np.array(ZEROS) * PILLARS)))

FIXINGS = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0]
PAYMENTS = [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5]
STRIKE, MULT = 0.045, 2.0


@pytest.fixture(scope="module")
def model():
    return HullWhiteModel(CURVE, 0.10, 0.011)


@pytest.fixture(scope="module")
def sim(model):
    td = TimeDiscretization(initial=0.0, num_steps=9, step=0.5)
    return HullWhiteSimulation(model, td, num_paths=200_000, seed=13,
                               antithetic=True)


class TestUncappedOracle:
    def test_target_inf_is_floorlet_portfolio(self, model, sim):
        note = TargetRedemptionNote(FIXINGS, PAYMENTS, STRIKE,
                                    target=float("inf"), multiplier=MULT)
        v, e = note.get_value_and_error(sim)
        an = inverse_floater_value(model, FIXINGS, PAYMENTS, STRIKE,
                                   multiplier=MULT)
        assert abs(v - an) < 4 * e + 2e-4 * an

    def test_parity_floorlet_is_positive_and_sane(self, model):
        an = inverse_floater_value(model, FIXINGS, PAYMENTS, STRIKE,
                                   multiplier=MULT)
        bond = float(model.df(PAYMENTS[-1]))
        assert an > bond  # nonnegative coupons on top of the redemption
        assert an < bond + STRIKE * len(FIXINGS)  # coupons capped at K*delta


class TestTargetLimits:
    def test_tiny_target_degenerates_to_first_payment_bond(self, sim,
                                                           model):
        # deep-ITM inverse floater: first coupon positive a.s., so a
        # tiny target knocks at the first payment date
        note = TargetRedemptionNote(FIXINGS, PAYMENTS, strike=0.5,
                                    target=1e-9, multiplier=1.0)
        v, _ = note.get_value_and_error(sim)
        assert abs(v - float(model.df(PAYMENTS[0]))) < 1e-5

    def test_full_cap_dominates_exact_cap(self, sim):
        kw = dict(fixing_times=FIXINGS, payment_times=PAYMENTS,
                  strike=STRIKE, target=0.04, multiplier=MULT)
        v_full, _ = TargetRedemptionNote(cap_mode="full", **kw) \
            .get_value_and_error(sim)
        v_exact, _ = TargetRedemptionNote(cap_mode="exact", **kw) \
            .get_value_and_error(sim)
        assert v_full >= v_exact - 1e-12

    def test_monotone_in_strike(self, sim):
        vals = []
        for k in (0.03, 0.045, 0.06):
            note = TargetRedemptionNote(FIXINGS, PAYMENTS, k,
                                        target=0.06, multiplier=MULT)
            vals.append(note.get_value(sim))
        assert vals[0] <= vals[1] <= vals[2]  # higher K, bigger coupons


class TestSameStream:
    def test_numpy_reimplementation_on_same_paths(self, sim):
        target = 0.05
        note = TargetRedemptionNote(FIXINGS, PAYMENTS, STRIKE,
                                    target=target, multiplier=MULT)
        v, _ = note.get_value_and_error(sim)

        # eager reassembly through the public RandomVariable surface
        paths = sim.get_number_of_paths()
        alive = np.ones(paths)
        cum = np.zeros(paths)
        acc = np.zeros(paths)
        for tf, tp in zip(FIXINGS, PAYMENTS):
            delta = tp - tf
            p = np.asarray(sim.bond(tf, tp).values, dtype=np.float64)
            libor = (1.0 / p - 1.0) / delta
            coupon = delta * np.maximum(STRIKE - MULT * libor, 0.0)
            room = np.maximum(target - cum, 0.0)
            paid = np.minimum(coupon, room)
            knock = (cum + coupon >= target).astype(np.float64)
            inv_n = 1.0 / np.asarray(sim.numeraire(tp).values,
                                     dtype=np.float64)
            acc += inv_n * alive * (paid + knock)
            cum += alive * coupon
            alive *= 1.0 - knock
        inv_n_last = 1.0 / np.asarray(sim.numeraire(PAYMENTS[-1]).values,
                                      dtype=np.float64)
        ref_value = (acc + alive * inv_n_last).mean()
        # f32 storage vs f64 kernel assembly: small relative slack
        assert abs(v - ref_value) < 5e-5 * max(1.0, abs(ref_value))

    def test_validation(self):
        with pytest.raises(ValueError):
            TargetRedemptionNote([1.0], [0.5], 0.04, 0.05)
        with pytest.raises(ValueError):
            TargetRedemptionNote([1.0], [1.5], 0.04, 0.05,
                                 cap_mode="bogus")
        with pytest.raises(ValueError):
            TargetRedemptionNote([], [], 0.04, 0.05)
