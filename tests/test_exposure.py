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

    def test_qmc_increments_compose(self, setup):
        """Exposure engines consume injected increments — Sobol QMC paths
        drive the same collector (the estimator-composition story of the
        pricing stack extends to XVA)."""
        from finmath_tpu.models.qmc import sobol_brownian_increments

        p0 = setup.covariance.initial_parameters
        kw = dict(first_index=2, last_index=6, strike=0.01,
                  num_paths=4096, num_factors=1)
        sim = setup.model.sim_times
        inc = sobol_brownian_increments(sim[1:] - sim[:-1], 1, 4096, seed=7)
        eng = SwapExposureEngine(setup.model, increments=inc, **kw)
        prof = eng.profile(p0)
        assert np.all(np.isfinite(prof.ee))
        # QMC stratification: the martingale check holds at least as
        # tightly as plain MC at the same path count
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


class TestNettingSet:
    """Close-out netting: pathwise trade values sum BEFORE the positive
    part; the standalone EE sum is collected in the same pass."""

    @pytest.fixture(scope="class")
    def engines(self, setup):
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwapTrade)

        trades = [
            SwapTrade(2, 12, 0.005, payer=True, notional=2.0),
            SwapTrade(4, 8, 0.012, payer=False, notional=1.0),
        ]
        eng = NettingSetExposureEngine(
            setup.model, trades, num_paths=N_PATHS, num_factors=1, seed=11)
        return eng, eng.profile(setup.covariance.initial_parameters)

    def test_forward_value_martingale(self, engines):
        eng, prof = engines
        assert np.max(np.abs(prof.forward_value
                             - eng.analytic_forward_values())) < 4e-3

    def test_netting_benefit_nonnegative(self, engines):
        _, prof = engines
        assert np.all(prof.netting_benefit >= -1e-12)
        # opposing directions MUST produce a strict benefit somewhere
        assert np.max(prof.netting_benefit) > 0.0

    def test_single_trade_set_has_zero_benefit(self, setup,
                                               profile_and_engine):
        """max over a single trade == the netted max: standalone == netted."""
        prof, _ = profile_and_engine
        assert np.allclose(prof.netting_benefit, 0.0, atol=1e-15)

    def test_perfect_hedge_nets_to_zero(self, setup):
        """A payer and its mirror receiver: netted value is identically 0
        pathwise, while the standalone EE is strictly positive."""
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwapTrade)

        p0 = setup.covariance.initial_parameters
        trades = [SwapTrade(2, 8, 0.01, payer=True),
                  SwapTrade(2, 8, 0.01, payer=False)]
        prof = NettingSetExposureEngine(
            setup.model, trades, num_paths=N_PATHS, num_factors=1,
            seed=3).profile(p0)
        assert np.allclose(prof.ee, 0.0, atol=1e-12)
        assert np.allclose(prof.ene, 0.0, atol=1e-12)
        assert np.allclose(prof.pfe[0.99], 0.0, atol=1e-12)
        assert np.all(prof.ee_standalone > 0.0)

    def test_matured_trade_drops_out(self, setup):
        """Past a trade's final payment, the netted profile equals the
        surviving trade's standalone profile on the same paths."""
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwapTrade)

        p0 = setup.covariance.initial_parameters
        long_tr = SwapTrade(1, 12, 0.008, payer=True)
        short_tr = SwapTrade(1, 6, 0.002, payer=False)
        netted = NettingSetExposureEngine(
            setup.model, [long_tr, short_tr], num_paths=N_PATHS,
            num_factors=1, seed=17).profile(p0)
        alone = NettingSetExposureEngine(
            setup.model, [long_tr], num_paths=N_PATHS, num_factors=1,
            seed=17, observation_indices=range(1, 12)).profile(p0)
        # observations 6..11 (ordinals 5..10): only long_tr is alive
        assert np.allclose(netted.ee[5:], alone.ee[5:], atol=1e-12)
        assert np.allclose(netted.pfe[0.95][5:], alone.pfe[0.95][5:],
                           atol=1e-12)

    def test_empty_set_raises(self, setup):
        from finmath_tpu.models.lmm.exposure import NettingSetExposureEngine

        with pytest.raises(ValueError):
            NettingSetExposureEngine(setup.model, [])


class TestMixedNettingSet:
    """Netting sets mixing curve-analytic swaps with LS-regressed
    swaption close-out values."""

    X, M = 8, 8

    @pytest.fixture(scope="class")
    def strike(self, setup):
        from finmath_tpu.models.curves import par_swap_rate

        m = setup.model
        return float(par_swap_rate(m.forward_curve, m.discount_curve,
                                   m.tenor_times[self.X:self.X + self.M + 1]))

    def test_swaption_only_set_matches_dedicated_engine(self, setup,
                                                        strike):
        """A one-swaption netting set reproduces SwaptionExposureEngine
        exactly (same seed, same regression, same paths)."""
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionExposureEngine, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        nset = NettingSetExposureEngine(
            setup.model, [SwaptionTrade(self.X, self.M, strike)],
            num_paths=N_PATHS, num_factors=1, seed=123).profile(p0)
        alone = SwaptionExposureEngine(
            setup.model, self.X, self.M, strike, physical=True,
            num_paths=N_PATHS, num_factors=1, seed=123).profile(p0)
        assert np.allclose(nset.ee, alone.ee, atol=1e-12)
        assert np.allclose(nset.ene, alone.ene, atol=1e-12)
        assert np.allclose(nset.pfe[0.95], alone.pfe[0.95], atol=1e-12)

    def test_long_short_swaptions_net_to_zero(self, setup, strike):
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        prof = NettingSetExposureEngine(
            setup.model,
            [SwaptionTrade(self.X, self.M, strike, notional=1.0),
             SwaptionTrade(self.X, self.M, strike, notional=-1.0)],
            num_paths=N_PATHS, num_factors=1, seed=9).profile(p0)
        assert np.allclose(prof.ee, 0.0, atol=1e-12)
        assert np.allclose(prof.ene, 0.0, atol=1e-12)
        assert np.all(prof.ee_standalone > 0.0)

    def test_mixed_set_forward_value_adds(self, setup, strike):
        """Close-out values sum pathwise, so the (linear) forward value
        of a mixed set equals the sum of the single-trade sets' forward
        values on the same paths — while EE subadds (netting)."""
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwapTrade, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        sw = SwapTrade(2, self.X + self.M, 0.006, payer=False)
        opt = SwaptionTrade(self.X, self.M, strike)
        kw = dict(num_paths=N_PATHS, num_factors=1, seed=31,
                  observation_indices=range(1, self.X + self.M))
        mixed = NettingSetExposureEngine(
            setup.model, [sw, opt], **kw).profile(p0)
        only_sw = NettingSetExposureEngine(
            setup.model, [sw], **kw).profile(p0)
        only_opt = NettingSetExposureEngine(
            setup.model, [opt], **kw).profile(p0)
        assert np.allclose(mixed.forward_value,
                           only_sw.forward_value + only_opt.forward_value,
                           atol=1e-10)
        assert np.all(mixed.ee <= only_sw.ee + only_opt.ee + 1e-12)
        assert np.max(mixed.netting_benefit) > 0.0

    def test_cash_settled_swaption_trade_dies_at_expiry(self, setup,
                                                        strike):
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        prof = NettingSetExposureEngine(
            setup.model,
            [SwaptionTrade(self.X, self.M, strike, physical=False)],
            num_paths=N_PATHS, num_factors=1, seed=9).profile(p0)
        evx = self.X - 1  # observations start at tenor index 1
        assert prof.ee[evx] > 0.0
        assert np.allclose(prof.ee[evx + 1:], 0.0, atol=1e-15)

    def test_cva_deltas_guarded_for_swaptions(self, setup, strike):
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionTrade)

        eng = NettingSetExposureEngine(
            setup.model, [SwaptionTrade(self.X, self.M, strike)],
            num_paths=N_PATHS, num_factors=1)
        with pytest.raises(NotImplementedError):
            eng.cva_forward_deltas(setup.covariance.initial_parameters,
                                   hazard_rate=0.01)

    def test_swaption_expiry_must_be_observed(self, setup, strike):
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionTrade)

        with pytest.raises(ValueError):
            NettingSetExposureEngine(
                setup.model, [SwaptionTrade(self.X, self.M, strike)],
                num_paths=N_PATHS, num_factors=1,
                observation_indices=[2, 4])  # missing the expiry index


class TestSwaptionExposure:
    """Exposure of a product whose time-t value is a CONDITIONAL
    expectation (Longstaff-Schwartz regression on the par swap rate)."""

    X, M = 8, 8  # 4Y expiry into a 4Y swap

    @pytest.fixture(scope="class")
    def swaption_setup(self, setup):
        from finmath_tpu.models.curves import par_swap_rate
        from finmath_tpu.models.lmm.exposure import SwaptionExposureEngine

        model = setup.model
        strike = par_swap_rate(model.forward_curve, model.discount_curve,
                               model.tenor_times[self.X:self.X + self.M + 1])
        eng = SwaptionExposureEngine(
            model, self.X, self.M, strike, physical=True,
            num_paths=N_PATHS, num_factors=1, seed=123)
        return eng, eng.profile(setup.covariance.initial_parameters), strike

    def test_regression_preserves_the_mean(self, swaption_setup):
        """With a constant in the basis, least squares preserves the mean
        exactly: forward_value is CONSTANT (= the discounted expected
        payoff) at every observation up to and including expiry."""
        eng, prof, _ = swaption_setup
        up_to_x = prof.forward_value[:eng._ev_x + 1]
        assert np.max(np.abs(up_to_x - up_to_x[-1])) < 1e-10

    def test_value_matches_valuation_engine(self, setup, swaption_setup):
        """forward_value at expiry == the swaption price from a fresh
        valuation engine on the same seed (identical Brownian stream,
        identical collector arithmetic)."""
        from finmath_tpu.models.lmm.model import (LMMValuationEngine,
                                                  SwaptionProduct)

        eng, prof, strike = swaption_setup
        pricer = LMMValuationEngine(
            setup.model,
            [SwaptionProduct(self.X, self.M, strike, 0.0,
                             value_unit="VALUE")],
            N_PATHS, 1, seed=123)
        value = float(pricer.values(setup.covariance.initial_parameters)[0])
        assert prof.forward_value[eng._ev_x] == pytest.approx(value,
                                                              rel=1e-9)

    def test_option_exposure_is_nonnegative_before_expiry(self,
                                                          swaption_setup):
        eng, prof, _ = swaption_setup
        k = eng._ev_x + 1
        assert np.all(prof.ee[:k] >= 0.0)
        assert np.all(prof.ene[:k] == 0.0)  # an option is never a liability
        # Jensen: EE >= the (positive) forward value
        assert np.all(prof.ee[:k] >= prof.forward_value[:k] - 1e-12)

    def test_physical_exercise_continues_and_can_go_negative(
            self, swaption_setup):
        """After physical exercise the position is a two-way swap on the
        exercised set: exposure continues and ENE can be negative."""
        eng, prof, _ = swaption_setup
        k = eng._ev_x
        assert len(prof.times) == self.X + self.M - 1
        assert np.any(prof.ee[k + 1:] > 0.0)
        assert np.all(prof.ene[k + 1:] <= 0.0)
        # the exercised swap amortizes: the final exposure is small
        assert prof.ee[-1] < 0.5 * np.max(prof.ee)

    def test_cash_settlement_dies_at_expiry(self, setup, swaption_setup):
        from finmath_tpu.models.lmm.exposure import SwaptionExposureEngine

        _, _, strike = swaption_setup
        eng = SwaptionExposureEngine(
            setup.model, self.X, self.M, strike, physical=False,
            num_paths=N_PATHS, num_factors=1, seed=123)
        prof = eng.profile(setup.covariance.initial_parameters)
        assert len(prof.times) == self.X
        assert prof.times[-1] == pytest.approx(
            float(setup.model.tenor_times[self.X]))

    def test_exposure_peaks_at_expiry_for_atm(self, swaption_setup):
        """An ATM swaption's discounted EE grows toward expiry (more
        optionality resolved) then amortizes on the exercised swap."""
        eng, prof, _ = swaption_setup
        k = eng._ev_x
        assert prof.ee[k] == pytest.approx(np.max(prof.ee[:k + 1]),
                                           rel=0.15)

    def test_cva_positive(self, setup, swaption_setup):
        eng, _, _ = swaption_setup
        c = eng.cva(setup.covariance.initial_parameters, hazard_rate=0.01)
        assert c > 0.0

    def test_invalid_args_raise(self, setup):
        from finmath_tpu.models.lmm.exposure import SwaptionExposureEngine

        with pytest.raises(ValueError):
            SwaptionExposureEngine(setup.model, 0, 4, 0.01)
        with pytest.raises(ValueError):
            SwaptionExposureEngine(setup.model, 4, 4, 0.01, basis_degree=0)


class TestRegulatoryMeasures:
    """EPE / effective EPE on a synthetic profile (pure numpy — the
    Basel measures are deterministic functionals of the EE profile)."""

    @pytest.fixture()
    def prof(self):
        from finmath_tpu.models.lmm.exposure import ExposureProfile

        times = np.asarray([0.5, 1.0, 1.5, 2.0])
        ee = np.asarray([2.0, 4.0, 1.0, 3.0])
        z = np.zeros(4)
        return ExposureProfile(times, ee, z, z, {0.95: ee})

    def test_epe_is_the_time_weighted_average(self, prof):
        # equal 0.5y buckets: EPE = mean(EE)
        assert prof.epe() == pytest.approx(2.5)
        # horizon inside the grid re-weights the last bucket
        assert prof.epe(horizon=1.0) == pytest.approx(3.0)
        # partial last bucket: [0,0.75] = 0.5*2.0 + 0.25*4.0 over 0.75
        assert prof.epe(horizon=0.75) == pytest.approx(
            (0.5 * 2.0 + 0.25 * 4.0) / 0.75)

    def test_effective_ee_is_the_running_max(self, prof):
        eff = prof.effective_ee()
        assert np.array_equal(eff, [2.0, 4.0, 4.0, 4.0])
        assert np.all(np.diff(eff) >= 0)
        assert np.all(eff >= prof.ee)

    def test_effective_epe_dominates_epe(self, prof):
        assert prof.effective_epe() == pytest.approx(3.5)
        assert prof.effective_epe() >= prof.epe()

    def test_epe_horizon_validation(self, prof):
        with pytest.raises(ValueError):
            prof.epe(horizon=0.0)
        with pytest.raises(ValueError):
            prof.epe(horizon=99.0)


class TestCVADeltas:
    """CVA forward-delta ladder: one reverse-mode pass through
    simulation + exposure (the XVA-desk sensitivity)."""

    @pytest.fixture(scope="class")
    def f64_engine(self, setup):
        import numpy as np

        return SwapExposureEngine(
            setup.model, first_index=2, last_index=10, strike=0.005,
            num_paths=2000, num_factors=1, seed=21, dtype=np.float64)

    def test_ad_matches_finite_differences(self, setup, f64_engine):
        """Reverse-mode dCVA/dL0 == central FD of the SAME f64 core."""
        import jax.numpy as jnp

        from finmath_tpu.models.lmm.exposure import (
            _default_probability_vector)

        eng = f64_engine
        p0 = setup.covariance.initial_parameters
        cva, grad = eng.cva_forward_deltas(p0, hazard_rate=0.01)
        assert np.all(np.isfinite(grad))
        pd = 0.6 * _default_probability_vector(eng._obs_times, 0.01, None)
        fwd0 = np.asarray(setup.model.initial_forwards, dtype=np.float64)
        p64 = jnp.asarray(p0, dtype=jnp.float64)
        h = 1e-7
        for b in (2, 5, 8):
            fp = fwd0.copy(); fp[b] += h
            fm = fwd0.copy(); fm[b] -= h
            vp = float(eng._cva_delta_fn(p64, jnp.asarray(fp),
                                         jnp.asarray(pd))[0])
            vm = float(eng._cva_delta_fn(p64, jnp.asarray(fm),
                                         jnp.asarray(pd))[0])
            fd = (vp - vm) / (2 * h)
            assert grad[b] == pytest.approx(fd, rel=1e-5, abs=1e-10)

    def test_value_matches_cva(self, setup, f64_engine):
        """The delta core's primal equals the profile-route CVA (same f64
        arithmetic up to the plain-vs-compensated cumprod)."""
        p0 = setup.covariance.initial_parameters
        cva, _ = f64_engine.cva_forward_deltas(p0, hazard_rate=0.01)
        assert cva == pytest.approx(
            f64_engine.cva(p0, hazard_rate=0.01), rel=1e-9)

    def test_dead_buckets_have_zero_delta(self, setup, f64_engine):
        """Forwards beyond the swap's last payment never enter payoffs or
        the (spot) numeraire on the observation window."""
        p0 = setup.covariance.initial_parameters
        _, grad = f64_engine.cva_forward_deltas(p0, hazard_rate=0.01)
        assert np.allclose(grad[f64_engine.last_index:], 0.0, atol=1e-14)
        # and the live buckets do carry risk
        assert np.max(np.abs(grad[:f64_engine.last_index])) > 0.0

    def test_f32_production_path_finite(self, setup):
        """The f32 engine's ladder is finite and close to the f64 one."""
        eng32 = SwapExposureEngine(
            setup.model, first_index=2, last_index=10, strike=0.005,
            num_paths=2000, num_factors=1, seed=21)
        p0 = setup.covariance.initial_parameters
        cva32, g32 = eng32.cva_forward_deltas(p0, hazard_rate=0.01)
        assert np.all(np.isfinite(g32))
        assert cva32 == pytest.approx(
            eng32.cva(p0, hazard_rate=0.01), rel=1e-3, abs=1e-9)


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

    def test_dva_mirrors_cva_of_the_flipped_position(self, setup,
                                                     profile_and_engine):
        """DVA(payer profile) == CVA(receiver profile) at equal hazard —
        the negative exposure of one side IS the positive of the other
        (exact: same paths, mirrored sign)."""
        from finmath_tpu.models.lmm.exposure import (cva_from_profile,
                                                     dva_from_profile)

        _, eng = profile_and_engine
        p0 = setup.covariance.initial_parameters
        payer_prof = eng.profile(p0)
        recv = SwapExposureEngine(
            setup.model, first_index=4, last_index=20, strike=0.02,
            payer=False, num_paths=N_PATHS, num_factors=1, seed=777,
            quantiles=(0.5, 0.95, 0.99))
        recv_prof = recv.profile(p0)
        dva = dva_from_profile(payer_prof, own_hazard_rate=0.01)
        cva_mirror = cva_from_profile(recv_prof, hazard_rate=0.01)
        assert dva == pytest.approx(cva_mirror, rel=1e-12)
        assert dva >= 0.0

    def test_bilateral_cva_decomposes(self, setup, profile_and_engine):
        from finmath_tpu.models.lmm.exposure import (
            bilateral_cva_from_profile, cva_from_profile, dva_from_profile)

        _, eng = profile_and_engine
        prof = eng.profile(setup.covariance.initial_parameters)
        b = bilateral_cva_from_profile(prof, counterparty_hazard_rate=0.02,
                                       own_hazard_rate=0.005)
        assert b == pytest.approx(
            cva_from_profile(prof, hazard_rate=0.02)
            - dva_from_profile(prof, own_hazard_rate=0.005), rel=1e-12)

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


class TestBermudanExposure:
    """Exercise-aware Bermudan close-out values in the netting engine:
    LS policy, pathwise stopping times, post-exercise swap exposure."""

    X, M = 8, 8           # first exercise, final payment X + M

    @pytest.fixture(scope="class")
    def strike(self, setup):
        from finmath_tpu.models.curves import par_swap_rate

        m = setup.model
        return float(par_swap_rate(m.forward_curve, m.discount_curve,
                                   m.tenor_times[self.X:self.X + self.M + 1]))

    @pytest.fixture(scope="class")
    def berm_profile(self, setup, strike):
        """Shared 3-exercise physical Bermudan profile."""
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine)

        eng = NettingSetExposureEngine(
            setup.model,
            [BermudanSwaptionTrade((self.X, self.X + 2, self.X + 4),
                                   self.X + self.M, strike)],
            num_paths=N_PATHS, num_factors=1, seed=123)
        return eng.profile(setup.covariance.initial_parameters)

    def test_single_exercise_matches_european(self, setup, strike):
        """A one-date Bermudan IS the European swaption: the backward
        induction degenerates to the same regression of the same floored
        discounted payoff on the same paths (same seed)."""
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        kw = dict(num_paths=N_PATHS, num_factors=1, seed=123)
        berm = NettingSetExposureEngine(
            setup.model,
            [BermudanSwaptionTrade((self.X,), self.X + self.M, strike)],
            **kw).profile(p0)
        eur = NettingSetExposureEngine(
            setup.model, [SwaptionTrade(self.X, self.M, strike)],
            **kw).profile(p0)
        assert np.allclose(berm.ee, eur.ee, atol=1e-10)
        assert np.allclose(berm.ene, eur.ene, atol=1e-10)
        assert np.allclose(berm.pfe[0.95], eur.pfe[0.95], atol=1e-10)

    def test_t0_value_matches_bermudan_pricer(self, setup, strike,
                                              berm_profile):
        """forward_value before the first exercise reprices the dedicated
        BermudanSwaptionPricer (different engine, different basis, same
        model) within its own lower/upper duality bracket + MC noise."""
        from finmath_tpu.models.lmm.bermudan import (BermudanSwaption,
                                                     BermudanSwaptionPricer)

        p0 = setup.covariance.initial_parameters
        pricer = BermudanSwaptionPricer(
            setup.model,
            BermudanSwaption((self.X, self.X + 2, self.X + 4),
                             self.X + self.M, strike),
            num_paths=N_PATHS, num_factors=1, seed=123)
        lo, hi = pricer.get_value_bounds(p0)
        mc_tol = 4e-4            # ~3 sigma at 8k paths for this product
        v0 = berm_profile.forward_value[0]
        assert lo - mc_tol <= v0 <= hi + mc_tol

    def test_bermudan_dominates_european(self, setup, strike, berm_profile):
        """More exercise rights cannot be worth less: the Bermudan's t=0
        forward value >= the European into the same final swap (same
        paths, same regression family)."""
        from finmath_tpu.models.lmm.exposure import (
            NettingSetExposureEngine, SwaptionTrade)

        p0 = setup.covariance.initial_parameters
        eur = NettingSetExposureEngine(
            setup.model, [SwaptionTrade(self.X, self.M, strike)],
            num_paths=N_PATHS, num_factors=1, seed=123).profile(p0)
        assert berm_profile.forward_value[0] >= \
            eur.forward_value[0] - 2e-4

    def test_forward_value_flat_before_first_exercise(self, berm_profile):
        """The regressed close-out value preserves the mean, so the
        forward value is (approximately) constant up to the first
        exercise date — the martingale diagnostic."""
        pre = berm_profile.forward_value[:self.X - 1]
        assert np.max(np.abs(pre - pre[0])) < 6e-4

    def test_exposure_nonnegative_before_first_exercise(self, berm_profile):
        assert np.all(berm_profile.ene[:self.X - 1] >= -1e-12)

    def test_physical_exercise_continues_and_can_go_negative(
            self, berm_profile):
        """After exercise the underlying swap is a two-way obligation."""
        assert np.min(berm_profile.ene[self.X:]) < 0.0
        assert np.max(berm_profile.ee[self.X:]) > 0.0

    def test_cash_settlement_dies_after_last_exercise(self, setup, strike):
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine)

        p0 = setup.covariance.initial_parameters
        prof = NettingSetExposureEngine(
            setup.model,
            [BermudanSwaptionTrade((self.X, self.X + 2), self.X + self.M,
                                   strike, physical=False)],
            num_paths=N_PATHS, num_factors=1, seed=7).profile(p0)
        last_x_ev = self.X + 2 - 1    # observations start at index 1
        assert np.allclose(prof.ee[last_x_ev + 1:], 0.0, atol=1e-15)
        assert np.all(prof.ene >= -1e-12)   # cash option never a liability
        assert prof.ee[last_x_ev - 1] > 0.0

    def test_netting_against_offsetting_swap(self, setup, strike):
        """A receiver swap over the underlying's periods offsets the
        exercised Bermudan pathwise: netted EE < standalone sum."""
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine, SwapTrade)

        p0 = setup.covariance.initial_parameters
        prof = NettingSetExposureEngine(
            setup.model,
            [BermudanSwaptionTrade((self.X, self.X + 2), self.X + self.M,
                                   strike),
             SwapTrade(self.X, self.X + self.M, strike, payer=False)],
            num_paths=N_PATHS, num_factors=1, seed=11).profile(p0)
        assert np.all(prof.netting_benefit >= -1e-12)
        assert np.max(prof.netting_benefit) > 0.0

    def test_guards(self, setup, strike):
        from finmath_tpu.models.lmm.exposure import (
            BermudanSwaptionTrade, NettingSetExposureEngine)

        p0 = setup.covariance.initial_parameters
        with pytest.raises(ValueError):
            BermudanSwaptionTrade((self.X, self.X), self.X + self.M, strike)
        with pytest.raises(ValueError):
            BermudanSwaptionTrade((self.X + self.M,), self.X + self.M,
                                  strike)
        with pytest.raises(ValueError):
            # exercise date not observed
            NettingSetExposureEngine(
                setup.model,
                [BermudanSwaptionTrade((self.X,), self.X + self.M, strike)],
                num_paths=N_PATHS, observation_indices=[2, 4])
        eng = NettingSetExposureEngine(
            setup.model,
            [BermudanSwaptionTrade((self.X,), self.X + self.M, strike)],
            num_paths=N_PATHS, num_factors=1)
        with pytest.raises(NotImplementedError):
            eng.cva_forward_deltas(p0, hazard_rate=0.01)
        with pytest.raises(NotImplementedError):
            eng.im_profile(p0)
