"""Counterparty exposure / CVA tests (capabilities-plus layer; the
reference's host library finmath-lib ships the equivalent
ExposureEstimator workload — see finmath_tpu/models/lmm/exposure.py).

The load-bearing check is the martingale identity: the DISCOUNTED
expected value E[V(t)/N(t)] of the remaining swap at every observation
date must reprice the t=0 curve value of those periods — this exercises
the simulated bond curve, the numeraire, and the numeraire adjustment at
every tenor date at once (the valuation tests only check it at exercise
dates of priced products)."""

import numpy as np
import pytest

from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
from finmath_tpu.models.lmm.exposure import SwapExposureEngine

N_PATHS = 8000


@pytest.fixture(scope="module")
def setup():
    return build_atm_calibration(num_paths=N_PATHS, num_factors=1)


@pytest.fixture(scope="module")
def profile_and_engine(setup):
    """One shared forward-starting payer-swap exposure run (observations
    both before and during the swap: first_index=4 > first observation)."""
    eng = SwapExposureEngine(
        setup.model, first_index=4, last_index=20, strike=0.02,
        payer=True, num_paths=N_PATHS, num_factors=1, seed=777,
        quantiles=(0.5, 0.95, 0.99))
    return eng.profile(setup.covariance.initial_parameters), eng


class TestSwapExposure:
    def test_forward_value_martingale(self, setup, profile_and_engine):
        """E[V(t)/N(t)] (numeraire-adjusted) == analytic t=0 value of the
        remaining periods, at EVERY observation date."""
        prof, eng = profile_and_engine
        analytic = eng.analytic_forward_values()
        assert np.max(np.abs(prof.forward_value - analytic)) < 2e-3

    def test_ee_ene_decompose_forward_value(self, profile_and_engine):
        """max(v,0) + min(v,0) == v pathwise, so EE + ENE == forward value
        exactly (same paths, f64 reduction)."""
        prof, _ = profile_and_engine
        assert np.allclose(prof.ee + prof.ene, prof.forward_value,
                           atol=1e-12)

    def test_exposure_bounds(self, profile_and_engine):
        prof, _ = profile_and_engine
        assert np.all(prof.ee >= 0.0)
        assert np.all(prof.ene <= 0.0)
        # EE dominates the positive part of the forward value (Jensen)
        assert np.all(prof.ee >= np.maximum(prof.forward_value, 0.0) - 1e-12)

    def test_pfe_quantile_ordering(self, profile_and_engine):
        prof, _ = profile_and_engine
        assert np.all(prof.pfe[0.99] >= prof.pfe[0.95] - 1e-12)
        assert np.all(prof.pfe[0.95] >= prof.pfe[0.5] - 1e-12)
        assert prof.max_pfe(0.99) >= prof.max_pfe(0.95)

    def test_exposure_dies_with_the_swap(self, profile_and_engine):
        """One period left at the last observation date: the tail exposure
        must be far below the peak (amortization of remaining risk)."""
        prof, _ = profile_and_engine
        assert prof.ee[-1] < 0.5 * np.max(prof.ee)

    def test_payer_receiver_mirror(self, setup):
        """Same seed, mirrored sign: EE_receiver == -ENE_payer exactly."""
        p0 = setup.covariance.initial_parameters
        kw = dict(first_index=2, last_index=8, strike=0.01,
                  num_paths=N_PATHS, num_factors=1, seed=99)
        payer = SwapExposureEngine(setup.model, payer=True, **kw).profile(p0)
        recv = SwapExposureEngine(setup.model, payer=False, **kw).profile(p0)
        assert np.allclose(recv.ee, -payer.ene, atol=1e-12)
        assert np.allclose(recv.ene, -payer.ee, atol=1e-12)

    def test_notional_scales_linearly(self, setup):
        p0 = setup.covariance.initial_parameters
        kw = dict(first_index=2, last_index=6, strike=0.01,
                  num_paths=N_PATHS, num_factors=1, seed=5)
        one = SwapExposureEngine(setup.model, notional=1.0, **kw).profile(p0)
        ten = SwapExposureEngine(setup.model, notional=10.0, **kw).profile(p0)
        assert np.allclose(ten.ee, 10.0 * one.ee, rtol=1e-12)
        assert np.allclose(ten.pfe[0.95], 10.0 * one.pfe[0.95], rtol=1e-12)

    def test_deterministic(self, setup, profile_and_engine):
        prof, eng = profile_and_engine
        again = eng.profile(setup.covariance.initial_parameters)
        assert np.array_equal(prof.ee, again.ee)
        assert np.array_equal(prof.pfe[0.99], again.pfe[0.99])

    def test_antithetic_composes(self, setup):
        p0 = setup.covariance.initial_parameters
        eng = SwapExposureEngine(
            setup.model, first_index=2, last_index=6, strike=0.01,
            num_paths=N_PATHS, num_factors=1, seed=5, antithetic=True)
        prof = eng.profile(p0)
        assert np.all(np.isfinite(prof.ee))
        assert np.max(np.abs(prof.forward_value
                             - eng.analytic_forward_values())) < 2e-3

    def test_invalid_ranges_raise(self, setup):
        with pytest.raises(ValueError):
            SwapExposureEngine(setup.model, first_index=0, last_index=6,
                               strike=0.01)
        with pytest.raises(ValueError):
            SwapExposureEngine(setup.model, first_index=4, last_index=4,
                               strike=0.01)
        with pytest.raises(ValueError):
            SwapExposureEngine(setup.model, first_index=2, last_index=6,
                               strike=0.01,
                               observation_indices=[6])  # >= last_index


class TestCVA:
    def test_cva_zero_hazard_zero(self, setup, profile_and_engine):
        _, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        assert eng.cva(p0, hazard_rate=0.0) == 0.0

    def test_cva_monotone_in_hazard(self, setup, profile_and_engine):
        _, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        c1 = eng.cva(p0, hazard_rate=0.005)
        c2 = eng.cva(p0, hazard_rate=0.02)
        assert 0.0 < c1 < c2

    def test_cva_bounded_by_peak_ee(self, setup, profile_and_engine):
        prof, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        c = eng.cva(p0, hazard_rate=0.5, recovery=0.4)
        # sum of default probabilities <= 1
        assert c <= 0.6 * np.max(prof.ee) + 1e-15

    def test_cva_explicit_default_probs(self, setup, profile_and_engine):
        prof, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        t = np.concatenate([[0.0], prof.times])
        surv = np.exp(-0.01 * t)
        pd = surv[:-1] - surv[1:]
        c_explicit = eng.cva(p0, default_probabilities=pd)
        c_flat = eng.cva(p0, hazard_rate=0.01)
        assert c_explicit == pytest.approx(c_flat, rel=1e-12)

    def test_cva_argument_validation(self, setup, profile_and_engine):
        _, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        with pytest.raises(ValueError):
            eng.cva(p0)  # neither
        with pytest.raises(ValueError):
            eng.cva(p0, hazard_rate=0.01,
                    default_probabilities=[0.1])  # both
        with pytest.raises(ValueError):
            eng.cva(p0, default_probabilities=[0.2])  # wrong length
