"""Importance-sampling tests
(finmath_tpu/models/importance_sampling.py): unbiasedness at every
tilt, closed-form agreement into the deep OTM tail, and the measured
variance reduction."""

import math

import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.importance_sampling import (
    mc_european_price_importance_sampled,
)

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N = 200_000


class TestImportanceSampling:
    def test_atm_matches_closed_form(self):
        v, e = mc_european_price_importance_sampled(
            7, N, S0, R, SIG, T, 100.0)
        an = black_scholes_option_value(S0, R, SIG, T, 100.0)
        assert abs(v - an) < 4 * e

    @pytest.mark.parametrize("k_mult", [2.0, 3.0, 4.0])
    def test_deep_otm_matches_closed_form(self, k_mult):
        k = k_mult * S0
        v, e = mc_european_price_importance_sampled(
            7, N, S0, R, SIG, T, k)
        an = black_scholes_option_value(S0, R, SIG, T, k)
        assert e < 0.05 * an          # the tilt makes the tail cheap
        assert abs(v - an) < 4 * e

    def test_unbiased_at_any_tilt(self):
        an = black_scholes_option_value(S0, R, SIG, T, 120.0)
        for mu in (0.0, 0.5, 1.5):
            v, e = mc_european_price_importance_sampled(
                11, N, S0, R, SIG, T, 120.0, drift_shift=mu)
            assert abs(v - an) < 4 * e, mu

    def test_variance_reduction_measured(self):
        k = 3.0 * S0
        _, e_plain = mc_european_price_importance_sampled(
            13, N, S0, R, SIG, T, k, drift_shift=0.0)
        _, e_is = mc_european_price_importance_sampled(
            13, N, S0, R, SIG, T, k)
        assert e_is < e_plain / 10    # measured ~x100 at 3x spot

    def test_put_side_tilt(self):
        k = 0.4 * S0
        v, e = mc_european_price_importance_sampled(
            17, N, S0, R, SIG, T, k, is_call=False)
        an = black_scholes_option_value(S0, R, SIG, T, k, is_call=False)
        assert abs(v - an) < 4 * e and e < 0.05 * an
