"""Hull-White Bermudan swaption tests (finmath_tpu/models/hw_bermudan.py):
the Crank-Nicolson PDE oracle against the Jamshidian closed form
(single exercise), the fused LS Monte-Carlo against the PDE Bermudan,
and no-arbitrage orderings."""

import numpy as np
import pytest

from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel, HullWhiteSimulation
from finmath_tpu.models.hw_bermudan import (
    BermudanSwaption,
    hw_bermudan_swaption_pde,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

TS = np.arange(0.5, 20.1, 0.5)
CURVE = DiscountCurve(list(TS), list(np.exp(-0.022 * TS)))
HW = HullWhiteModel(CURVE, 0.1, [0.01])
K = 0.025
EX = [2.0 + 0.5 * i for i in range(10)]      # 2.0 .. 6.5
FIN = 7.0


@pytest.fixture(scope="module")
def sim():
    td = TimeDiscretization(initial=0.0, num_steps=14, step=0.5)
    return HullWhiteSimulation(HW, td, num_paths=200_000, seed=11,
                               antithetic=True)


@pytest.fixture(scope="module")
def pde_value():
    return hw_bermudan_swaption_pde(HW, EX, FIN, K, nx=601,
                                    steps_per_year=100)


class TestPDEOracle:
    @pytest.mark.parametrize("payer", [True, False])
    def test_single_date_matches_jamshidian(self, payer):
        pde = hw_bermudan_swaption_pde(HW, [2.0], FIN, K, payer=payer,
                                       nx=601, steps_per_year=100)
        jam = HW.swaption(2.0, [FIN], K, payer=payer)
        assert abs(pde - jam) < 5e-4 * jam

    def test_bermudan_dominates_every_european(self, pde_value):
        prod = BermudanSwaption(EX, FIN, K)
        for i, t in enumerate(EX):
            jam = HW.swaption(t, list(prod.remaining_payments(i)), K)
            assert pde_value >= jam - 1e-6

    def test_more_exercise_rights_worth_more(self, pde_value):
        sparse = hw_bermudan_swaption_pde(HW, EX[::3], FIN, K, nx=601,
                                          steps_per_year=100)
        assert pde_value >= sparse - 1e-6


class TestLongstaffSchwartz:
    def test_matches_pde(self, sim, pde_value):
        v, e = BermudanSwaption(EX, FIN, K).get_value_and_error(sim)
        # LS is a lower-bound estimator; allow 4 stderr + a small
        # policy-suboptimality margin
        assert v < pde_value + 4 * e
        assert v > pde_value - 4 * e - 0.005 * pde_value

    def test_receiver_matches_pde(self, sim):
        pde = hw_bermudan_swaption_pde(HW, EX, FIN, K, payer=False,
                                       nx=601, steps_per_year=100)
        v, e = BermudanSwaption(EX, FIN, K, payer=False) \
            .get_value_and_error(sim)
        assert abs(v - pde) < 4 * e + 0.005 * pde

    def test_dominates_first_european_same_sim(self, sim):
        prod = BermudanSwaption(EX, FIN, K)
        v, e = prod.get_value_and_error(sim)
        eur = sim.mc_swaption_price(EX[0],
                                    list(prod.remaining_payments(0)), K)
        assert v >= eur - 4 * e

    def test_insample_at_least_split(self, sim):
        # in-sample LS has foresight bias: its value should not be
        # below the out-of-sample estimate (same paths)
        vs, es = BermudanSwaption(EX, FIN, K, foresight_bias="split") \
            .get_value_and_error(sim)
        vi, _ = BermudanSwaption(EX, FIN, K, foresight_bias="insample") \
            .get_value_and_error(sim)
        assert vi > vs - 4 * es

    def test_deep_itm_matches_pde(self, sim):
        # strike far below the curve. NOTE the Bermudan still exceeds
        # the first European here: Hull-White rates go negative on a
        # tail of paths (x Gaussian), and there waiting beats entering
        # the K~0 payer swap — so the PDE, not the European, is the
        # oracle (the gap is real: ~1% at this vol)
        k = 0.001
        prod = BermudanSwaption(EX, FIN, k)
        v, e = prod.get_value_and_error(sim)
        pde = hw_bermudan_swaption_pde(HW, EX, FIN, k, nx=601,
                                       steps_per_year=100)
        eur = HW.swaption(EX[0], list(prod.remaining_payments(0)), k)
        assert pde > eur                      # negative-rate optionality
        assert abs(v - pde) < 4 * e + 5e-3 * pde

    def test_validation(self):
        with pytest.raises(ValueError):
            BermudanSwaption([], FIN, K)
        with pytest.raises(ValueError):
            BermudanSwaption([2.0, 1.0], FIN, K)
        with pytest.raises(ValueError):
            BermudanSwaption([2.0], 1.5, K)
        with pytest.raises(ValueError):
            BermudanSwaption([2.0], FIN, K, foresight_bias="psychic")
