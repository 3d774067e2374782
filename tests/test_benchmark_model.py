"""Tests for the benchmark-test model stack (5-param exponential
covariance, blended local vol, stochastic vol, lognormal quotes) and the
analytic swaption approximation.

Maps the reference's LIBORMarketModelCalibrationTest (/root/reference/.../
LIBORMarketModelCalibrationTest.java — the published-benchmark workload)
and the ANALYTIC calibration-product variant of the ATM test. Sizes scaled
down for CI; full sizes live in bench.py / the TPU runs.
"""

import numpy as np
import pytest

from finmath_tpu.models.curves import (
    DiscountCurveFromForwardCurve,
    ForwardCurveFromForwards,
)
from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
from finmath_tpu.models.lmm.benchmark_calibration import (
    FIXING_TIMES,
    FORWARD_RATES,
    build_benchmark_calibration,
)


class TestCurvesFromForwards:
    def test_forward_interpolation(self):
        fc = ForwardCurveFromForwards(FIXING_TIMES, FORWARD_RATES, 0.5)
        assert fc.get_forward(0.0) == pytest.approx(0.0061)
        assert fc.get_forward(10.0) == pytest.approx(0.0292)
        # linear between pillars
        mid = fc.get_forward(0.75)
        assert min(0.0061, 0.0067) <= mid <= max(0.0061, 0.0067)

    def test_discount_curve_consistency(self):
        fc = ForwardCurveFromForwards(FIXING_TIMES, FORWARD_RATES, 0.5)
        dc = DiscountCurveFromForwardCurve(fc, horizon=50.0)
        # df must satisfy df(t)/df(t+0.5) = 1 + 0.5 * f(t) on the grid
        for t in (0.0, 5.0, 19.5):
            df0, df1 = dc.get_discount_factor([t, t + 0.5])
            assert df0 / df1 - 1.0 == pytest.approx(0.5 * fc.get_forward(t), rel=1e-10)


@pytest.fixture(scope="module")
def bench_setup():
    return build_benchmark_calibration(num_paths=2048, num_factors=5)


class TestBenchmarkModel:
    def test_workload_shape(self, bench_setup):
        # 9 smile + 10 ATM quotes, minus expiries beyond the 20Y grid
        assert len(bench_setup.products) == 15
        assert bench_setup.covariance.n_params == 8  # 5 + blend + nu + rho

    def test_initial_vols_in_market_ballpark(self, bench_setup):
        p0 = bench_setup.covariance.initial_parameters
        vols = bench_setup.engine.implied_vols(p0)
        # lognormal vols of the initial parametrization should come out in
        # the market's ballpark, and every quote must invert to a finite vol
        assert np.all(np.isfinite(vols))
        assert np.all((vols > 0.05) & (vols < 1.0))
        assert np.median(vols) == pytest.approx(0.27, abs=0.08)

    def test_stochastic_vol_changes_smile(self, bench_setup):
        """nu must steepen the smile: compare deep-ITM vs ATM vol response."""
        p0 = bench_setup.covariance.initial_parameters.copy()
        base = bench_setup.engine.implied_vols(p0)
        p_up = p0.copy()
        p_up[-2] = 0.60  # crank nu
        up = bench_setup.engine.implied_vols(p_up)
        # smile wings move more than ATM under stochastic vol
        assert not np.allclose(base, up, atol=1e-4)

    def test_jacobian_all_params_active(self, bench_setup):
        p0 = bench_setup.covariance.initial_parameters
        J = bench_setup.engine.jacobian(p0)
        assert J.shape == (15, 8)
        assert np.all(np.isfinite(J))
        # every parameter must influence at least one quote
        col_norm = np.abs(J).sum(axis=0)
        assert np.all(col_norm > 1e-8), col_norm

    def test_short_calibration_improves_fit(self, bench_setup):
        p0 = bench_setup.covariance.initial_parameters
        rms0 = float(np.sqrt(np.mean(bench_setup.engine.residuals(p0) ** 2)))
        res = bench_setup.calibrate(max_iterations=4, accuracy=1e-6)
        assert res.rms_error < rms0


class TestAntithetic:
    def test_antithetic_close_to_plain_and_tighter(self, bench_setup):
        """Antithetic variates: same model quotes within MC noise, with a
        measurably smaller seed-to-seed spread (the variance-reduction
        contract). Tiny sizes — the effect is large enough to see at 1024
        paths over 3 seeds."""
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        p0 = bench_setup.covariance.initial_parameters
        seeds = (11, 22, 33)
        spread = {}
        for anti in (False, True):
            vols = [
                LMMValuationEngine(bench_setup.model, bench_setup.products,
                                   1024, 5, s, antithetic=anti).implied_vols(p0)
                for s in seeds
            ]
            assert np.all(np.isfinite(np.stack(vols)))
            spread[anti] = float(np.std(np.stack(vols), axis=0).mean())
        assert spread[True] < spread[False]

    def test_odd_paths_rejected(self, bench_setup):
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        with pytest.raises(ValueError):
            LMMValuationEngine(bench_setup.model, bench_setup.products,
                               1023, 5, 1, antithetic=True)


class TestOverflowGuard:
    def test_extreme_stochvol_stays_finite(self, bench_setup):
        """Heavy-tailed regimes (|nu| ~ 1.5, the calibrated basin) can push
        a tail path past float32 range and poison the WHOLE mean with NaN
        via inf - inf; the engine clamps L and V to price-irrelevant
        finite bands. Regression for the NaN observed at 81,920 paths on
        fresh seeds (BENCHMARKS.md round-2 robustness note)."""
        from finmath_tpu.models.lmm.model import LMMValuationEngine

        p = np.asarray(bench_setup.covariance.initial_parameters).copy()
        p[6] = 3.0    # nu: extreme vol-of-vol
        p[5] = 1.5    # blend > 1
        for seed in (1, 2):
            eng = LMMValuationEngine(bench_setup.model, bench_setup.products,
                                     4096, 5, seed)
            v = eng.values(p)
            assert np.all(np.isfinite(v)), f"non-finite values at seed {seed}"
            assert np.all(np.isfinite(eng.implied_vols(p)))

    def test_absurd_vol_parameters_stay_finite(self):
        """Deterministic repro: all 43 ATM vol parameters at 50 (5000%)
        explode the unguarded f32 simulation through the drift within a
        few steps; with the guards every value and implied vol is finite
        (values collapse toward 0 where the numeraire overflows)."""
        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

        setup = build_atm_calibration(num_paths=512, num_factors=1)
        p = np.full(setup.covariance.n_params, 50.0)
        v = setup.engine.values(p)
        assert np.all(np.isfinite(v))
        assert np.all(np.isfinite(setup.engine.implied_vols(p)))


class TestAnalyticApproximation:
    def test_analytic_calibration_fast_and_accurate(self):
        setup = build_atm_calibration(calibration_product_type="ANALYTIC")
        res = setup.calibrate(max_iterations=100, accuracy=1e-9)
        assert res.rms_error < 2e-4
        assert abs(np.mean(setup.deviations(res.parameters))) < 5e-5

    def test_analytic_agrees_with_monte_carlo(self):
        analytic = build_atm_calibration(calibration_product_type="ANALYTIC")
        p = analytic.covariance.initial_parameters
        mc = build_atm_calibration(num_paths=4000, num_factors=1)
        vols_mc = mc.engine.implied_vols(p)
        vols_an = analytic.engine.implied_vols(p)
        # frozen-weight approximation + MC noise: agreement at a few 1e-4
        assert np.max(np.abs(vols_mc - vols_an)) < 1e-3

    def test_displaced_analytic_combination(self):
        """The fourth cell of the reference's modelType x productType
        matrix (ATM test :108-118): DISPLACED dynamics calibrated against
        the analytic approximation (local vol frozen at the initial
        forwards)."""
        setup = build_atm_calibration(model_type="DISPLACED",
                                      calibration_product_type="ANALYTIC")
        res = setup.calibrate(max_iterations=100, accuracy=1e-9)
        assert abs(np.mean(setup.deviations(res.parameters))) < 5e-5
        assert res.rms_error < 2e-4

    def test_accepts_lognormal_quotes(self):
        """Round-3: the analytic engine supports VOLATILITYLOGNORMAL via
        the Rebonato-style sigma_N / S0 map (it used to refuse)."""
        import numpy as np

        from finmath_tpu.models.lmm.analytic_approximation import (
            LMMAnalyticSwaptionEngine,
        )

        bench = build_benchmark_calibration(num_paths=256, num_factors=2)
        eng = LMMAnalyticSwaptionEngine(bench.model, bench.products)
        v = eng.implied_vols(np.asarray(bench.covariance.initial_parameters))
        assert np.all(np.isfinite(v)) and np.all(v > 0)


class TestNestedStochVolSettings:
    def test_engine_reads_nested_scaling_settings(self, bench_setup):
        """scaling_exponent / martingale_correction set on a NESTED
        stoch-vol model must reach the engine through outer wrappers
        (regression: getattr on the outermost wrapper silently fell back
        to the defaults)."""
        from finmath_tpu.models.lmm.covariance import (
            BlendedLocalVolatilityModel,
            LIBORCovarianceModelStochasticVolatility,
        )

        base = bench_setup.covariance.base.base  # the 5-param exp model
        sv_inner = LIBORCovarianceModelStochasticVolatility(
            base, nu=0.2, rho=0.1, scaling_exponent=1.0,
            martingale_correction=False)
        outer = BlendedLocalVolatilityModel(sv_inner, blend=0.2)
        assert outer.scaling_exponent == 1.0
        assert outer.martingale_correction is False
        # default nesting (stoch-vol outermost) unchanged
        assert bench_setup.covariance.scaling_exponent == 0.5
        assert bench_setup.covariance.martingale_correction is True

    def test_sweep_engine_reuses_main_engine_when_no_reduction(self):
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        setup = build_benchmark_calibration(num_paths=8192)
        assert setup.sweep_engine() is setup.engine
        setup2 = build_benchmark_calibration(num_paths=1024)
        assert setup2.sweep_engine() is setup2.engine  # floor >= paths

    def test_sweep_engine_reduction_branch(self):
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        setup = build_benchmark_calibration(num_paths=65_536)
        sweep = setup.sweep_engine()
        assert sweep is not setup.engine
        assert sweep.num_paths == 16_384     # paths // 4 above the floor
        assert setup.sweep_engine() is sweep  # cached
        # antithetic rounding: the reduced count stays even
        setup_a = build_benchmark_calibration(num_paths=65_536,
                                              antithetic=True)
        sweep_a = setup_a.sweep_engine()
        assert sweep_a.num_paths % 2 == 0 and sweep_a.num_paths == 16_384
