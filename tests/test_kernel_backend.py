"""Kernel-backed calibration residuals/Jacobians (models/lmm/
kernel_backend.py): the Pallas multi-product stoch-vol kernel must agree
with the scan engine on IDENTICAL normals — product by product — and its
common-random-number finite-difference Jacobian must track the engine's
exact jacfwd Jacobian.

Runs under the Pallas TPU interpreter on the CPU test backend (identical
arithmetic; this backend never uses the on-core PRNG). The interpreter's
lowering cost grows superlinearly with the kernel's unroll (measured:
~8 s at 4 steps x 5 factors, ~200 s at 10 x 5 on the 1-core sandbox), so
the CI config is a REDUCED model — 12 libors, 3 factors, 6 steps, 4
products over 3 exercise events — that exercises every code path
(multi-event collection, pset batching, CRN central differences). The
full benchmark-size validation runs on real TPU hardware in bench.py's
kernel leg."""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from finmath_tpu.models.curves import (DiscountCurveFromForwardCurve,
                                       ForwardCurveFromForwards)
from finmath_tpu.models.lmm.covariance import (
    BlendedLocalVolatilityModel,
    LIBORCovarianceModelExponentialForm5Param,
    LIBORCovarianceModelStochasticVolatility)
from finmath_tpu.models.lmm.kernel_backend import StochVolKernelCalibration
from finmath_tpu.models.lmm.model import (LIBORMarketModelTPU,
                                          LMMValuationEngine,
                                          SwaptionProduct)
from finmath_tpu.models.qmc import sobol_brownian_increments
from finmath_tpu.models.time_discretization import TimeDiscretization

PATHS = 256
N_LIBORS = 12
FACTORS = 3


def _small_setup(paths=PATHS, seed=5):
    """Benchmark-family model at interpreter-tractable size."""
    fix = np.arange(0.0, 10.5, 0.5)
    fwd = 0.02 + 0.002 * np.sin(fix)
    fc = ForwardCurveFromForwards(fix, fwd, 0.5)
    dc = DiscountCurveFromForwardCurve(fc, horizon=12.0)
    td = TimeDiscretization(initial=0.0, num_steps=N_LIBORS, step=0.5)
    cov = LIBORCovarianceModelExponentialForm5Param(
        td, td, FACTORS, (0.20, 0.05, 0.10, 0.05, 0.10))
    cov = BlendedLocalVolatilityModel(cov, blend=0.2, is_calibrateable=True)
    cov = LIBORCovarianceModelStochasticVolatility(
        cov, nu=0.25, rho=0.15, is_calibrateable=True)
    model = LIBORMarketModelTPU(td, fc, dc, cov, measure="spot",
                                state_space="normal",
                                use_numeraire_adjustment=False)
    tenor = model.tenor_times
    products = []
    for e, m, dk in ((2, 8, 0.0), (4, 4, 0.0), (6, 4, -0.005), (6, 6, 0.005)):
        from finmath_tpu.models.curves import par_swap_rate

        strike = dk + par_swap_rate(fc, dc, tenor[e:e + m + 1])
        products.append(SwaptionProduct(
            exercise_index=e, num_periods=m, strike=strike,
            target=0.30, weight=1.0, value_unit="VOLATILITYLOGNORMAL"))
    inc = np.asarray(sobol_brownian_increments(
        np.full(N_LIBORS, 0.5), FACTORS + 1, paths, seed=seed))
    engine = LMMValuationEngine(model, products, paths, FACTORS,
                                seed=seed, scan_mode="segmented",
                                increments=inc)
    return engine, cov, inc


@pytest.fixture(scope="module")
def setup_and_backend():
    engine, cov, inc = _small_setup()
    kb = StochVolKernelCalibration(engine, [inc])
    return engine, cov, kb


X0 = np.asarray([0.20, 0.05, 0.10, 0.05, 0.10, 0.2, 0.25, 0.15])
X1 = np.asarray([0.25, 0.02, 0.15, 0.03, -0.08, 0.6, 0.8, -0.4])


class TestKernelBackendParity:
    @pytest.mark.smoke
    def test_residuals_match_engine_same_normals(self, setup_and_backend):
        engine, _, kb = setup_and_backend
        for x in (X0, X1):
            with pltpu.force_tpu_interpret_mode():
                r_k = kb.residuals(x)
            r_e = np.asarray(engine.residuals(x))
            assert r_k.shape == r_e.shape
            # engine collects in f64 (compensated cumprod), the kernel in
            # f32: few-1e-5 vol-point agreement on identical normals is
            # the f32-collection envelope
            np.testing.assert_allclose(r_k, r_e, atol=5e-5)

    @pytest.mark.smoke
    def test_implied_vols_and_deviations(self, setup_and_backend):
        engine, _, kb = setup_and_backend
        with pltpu.force_tpu_interpret_mode():
            iv_k = kb.implied_vols(X0)
            dev_k = kb.deviations(X0)
        iv_e = np.asarray(engine.implied_vols(X0))
        np.testing.assert_allclose(iv_k, iv_e, atol=5e-5)
        np.testing.assert_allclose(dev_k, iv_k - engine.targets,
                                   rtol=0, atol=1e-12)

    def test_fd_jacobian_tracks_jacfwd(self, setup_and_backend):
        engine, _, kb = setup_and_backend
        with pltpu.force_tpu_interpret_mode():
            r0, J_k = kb.residuals_and_jacobian(X0)
            np.testing.assert_allclose(r0, kb.residuals(X0), atol=1e-12)
        J_e = np.asarray(engine.jacobian(X0))
        assert J_k.shape == J_e.shape
        # CRN central differences vs exact jacfwd: column-scaled agreement
        # (each parameter's sensitivity column has its own magnitude)
        scale = np.maximum(np.abs(J_e).max(axis=0), 1e-3)
        rel = np.abs(J_k - J_e) / scale[None, :]
        assert rel.max() < 0.05, (rel.max(), np.unravel_index(
            rel.argmax(), rel.shape))

    def test_realization_index_changes_result(self, setup_and_backend):
        engine, _, kb = setup_and_backend
        inc2 = np.asarray(sobol_brownian_increments(
            np.full(N_LIBORS, 0.5), FACTORS + 1, PATHS, seed=11))
        k = kb.add_realization(inc2)
        with pltpu.force_tpu_interpret_mode():
            r0 = kb.residuals(X0, 0)
            r1 = kb.residuals(X0, k)
        assert not np.allclose(r0, r1)
        # the new realization matches the engine on ITS stream
        engine.set_increments(inc2)
        try:
            np.testing.assert_allclose(
                r1, np.asarray(engine.residuals(X0)), atol=5e-5)
        finally:
            engine.set_increments(np.asarray(sobol_brownian_increments(
                np.full(N_LIBORS, 0.5), FACTORS + 1, PATHS, seed=5)))

    @pytest.mark.smoke
    def test_scope_guards(self):
        engine, _, inc = _small_setup(paths=128, seed=9)
        # wrong realization shape
        with pytest.raises(ValueError):
            StochVolKernelCalibration(
                engine, [np.zeros((N_LIBORS, FACTORS + 1, 64), np.float32)])
        # non-stoch-vol engine refused
        from finmath_tpu.models.lmm.atm_calibration import (
            build_atm_calibration)

        atm = build_atm_calibration(num_paths=128, num_factors=1, seed=1)
        with pytest.raises(ValueError):
            StochVolKernelCalibration(atm.engine, [inc])


# ---------------------------------------------------------------------------
# ATM kernel backend (NORMAL state space, no stoch vol, numeraire
# adjustment, Threefry-stream replication)
# ---------------------------------------------------------------------------

from finmath_tpu.models.lmm.covariance import (  # noqa: E402
    DisplacedLocalVolatilityModel,
    LIBORCorrelationModelExponentialDecay,
    LIBORVolatilityModelPiecewiseConstant)
from finmath_tpu.models.lmm.kernel_backend import (  # noqa: E402
    ATMKernelCalibration)


def _small_atm_setup(paths=250, seed=17, displaced=False, num_factors=2):
    """ATM-family model at interpreter-tractable size: piecewise-constant
    vol buckets, exponential-decay correlation, numeraire adjustment ON,
    engine-owned Threefry stream (NOT injected — the backend must
    replicate it). 250 paths deliberately NOT a multiple of 128: the
    accumulating kernel must mask the zero-padded tail paths."""
    from finmath_tpu.models.lmm.covariance import (
        LIBORCovarianceModelFromVolatilityAndCorrelation)

    fix = np.arange(0.0, 10.5, 0.5)
    fwd = 0.02 + 0.002 * np.sin(fix)
    fc = ForwardCurveFromForwards(fix, fwd, 0.5)
    dc = DiscountCurveFromForwardCurve(fc, horizon=12.0)
    td = TimeDiscretization(initial=0.0, num_steps=N_LIBORS, step=0.5)
    buckets = np.asarray([0.0, 1.0, 2.0, 4.0, 6.0])
    vol_model = LIBORVolatilityModelPiecewiseConstant(
        td, td, buckets, buckets, initial_volatility=0.005)
    corr = LIBORCorrelationModelExponentialDecay(td, num_factors, decay=0.1)
    cov = LIBORCovarianceModelFromVolatilityAndCorrelation(vol_model, corr)
    if displaced:
        cov = DisplacedLocalVolatilityModel(cov, 4.0, is_calibrateable=False)
    model = LIBORMarketModelTPU(td, fc, dc, cov, measure="spot",
                                state_space="normal",
                                use_numeraire_adjustment=True)
    from finmath_tpu.models.curves import par_swap_rate

    tenor = model.tenor_times
    products = []
    for e, m in ((2, 4), (4, 4), (6, 4), (6, 6)):
        strike = par_swap_rate(fc, dc, tenor[e:e + m + 1])
        products.append(SwaptionProduct(
            exercise_index=e, num_periods=m, strike=strike,
            target=0.005, weight=1.0, value_unit="VOLATILITYNORMAL"))
    engine = LMMValuationEngine(model, products, paths, num_factors,
                                seed=seed, scan_mode="segmented")
    return engine, cov


class TestATMKernelBackend:
    @pytest.mark.smoke
    def test_residuals_match_engine_threefry_replica(self):
        engine, cov = _small_atm_setup()
        kb = ATMKernelCalibration(engine)
        x0 = np.asarray(cov.initial_parameters)
        x1 = x0 * np.linspace(0.7, 1.6, x0.size)
        for x in (x0, x1):
            with pltpu.force_tpu_interpret_mode():
                r_k = kb.residuals(x)
            r_e = np.asarray(engine.residuals(x))
            np.testing.assert_allclose(r_k, r_e, atol=5e-5)

    def test_displaced_variant_and_jacobian(self):
        engine, cov = _small_atm_setup(displaced=True)
        kb = ATMKernelCalibration(engine)
        x0 = np.asarray(cov.initial_parameters)
        with pltpu.force_tpu_interpret_mode():
            r_k = kb.residuals(x0)
            r0, J_k = kb.residuals_and_jacobian(x0)
        r_e = np.asarray(engine.residuals(x0))
        np.testing.assert_allclose(r_k, r_e, atol=5e-5)
        np.testing.assert_allclose(r0, r_k, atol=1e-12)
        J_e = np.asarray(engine.jacobian(x0))
        scale = np.maximum(np.abs(J_e).max(axis=0), 1e-4)
        rel = np.abs(J_k - J_e) / scale[None, :]
        assert rel.max() < 0.05, rel.max()

    @pytest.mark.smoke
    def test_guards(self):
        engine, _, _ = _small_setup(paths=128, seed=9)
        with pytest.raises(ValueError):     # stoch-vol engine refused
            ATMKernelCalibration(engine)
