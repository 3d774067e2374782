"""Batched (lockstep multistart) Levenberg-Marquardt tests.

The TPU-first multistart design: K starts descend together, each
iteration evaluating ONE vmapped residual batch + ONE vmapped Jacobian
batch (finmath's LevenbergMarquardt is strictly sequential; its
numberOfThreads only parallelizes finite-difference columns —
LIBORMarketModelCalibrationATMTest.java:319-323)."""

import numpy as np
import pytest

from finmath_tpu.models.calibration import (
    BatchedLevenbergMarquardt,
    LevenbergMarquardt,
)


class TestSyntheticProblem:
    """y = a * exp(-b t) + c fit — 3 params, multiple starts."""

    T = np.linspace(0.0, 4.0, 25)
    TRUE = np.asarray([2.0, 1.3, 0.5])

    @classmethod
    def _target(cls):
        a, b, c = cls.TRUE
        return a * np.exp(-b * cls.T) + c

    @classmethod
    def _residuals(cls, X):
        X = np.atleast_2d(X)
        a, b, c = X[:, 0:1], X[:, 1:2], X[:, 2:3]
        return a * np.exp(-b * cls.T[None, :]) + c - cls._target()[None, :]

    @classmethod
    def _jacobian(cls, X):
        X = np.atleast_2d(X)
        a, b = X[:, 0:1], X[:, 1:2]
        e = np.exp(-b * cls.T[None, :])
        J = np.stack([e, -a * cls.T[None, :] * e,
                      np.ones_like(e)], axis=-1)
        return J

    def test_all_starts_converge(self):
        starts = np.asarray([
            [1.0, 1.0, 0.0],
            [3.0, 0.5, 1.0],
            [0.5, 2.0, 0.2],
            [2.5, 1.5, 0.8],
        ])
        blm = BatchedLevenbergMarquardt(self._residuals, self._jacobian,
                                        max_iterations=100, accuracy=1e-12)
        results = blm.run(starts)
        assert len(results) == 4
        for r in results:
            np.testing.assert_allclose(r.parameters, self.TRUE, atol=1e-6)
            assert r.rms_error < 1e-7

    def test_matches_sequential(self):
        x0 = np.asarray([1.0, 1.0, 0.0])
        seq = LevenbergMarquardt(
            lambda x: self._residuals(x)[0],
            lambda x: self._jacobian(x)[0],
            max_iterations=100, accuracy=1e-12, lower_bound=-np.inf,
        ).run(x0)
        bat = BatchedLevenbergMarquardt(
            self._residuals, self._jacobian,
            max_iterations=100, accuracy=1e-12,
        ).run(x0[None, :])[0]
        # different retry scheduling, same optimum
        np.testing.assert_allclose(bat.parameters, seq.parameters, atol=1e-6)

    def test_bounds_respected(self):
        blm = BatchedLevenbergMarquardt(self._residuals, self._jacobian,
                                        max_iterations=50,
                                        lower_bound=0.6, upper_bound=5.0)
        results = blm.run(np.asarray([[1.0, 1.0, 0.7]]))
        assert np.all(results[0].parameters >= 0.6 - 1e-15)
        assert np.all(results[0].parameters <= 5.0 + 1e-15)

    def test_rejects_1d_input(self):
        blm = BatchedLevenbergMarquardt(self._residuals, self._jacobian)
        with pytest.raises(ValueError):
            blm.run(np.asarray([1.0, 1.0, 0.0]))


class TestRetirementSemantics:
    """A start that gives up (reject patience / damping ceiling) must NOT
    report converged=True, and must not burn batched Jacobian evaluations
    while it idles (X unchanged => J unchanged => reuse)."""

    def test_stuck_start_not_converged_and_jacobian_reused(self):
        calls = {"jac": 0, "res": 0}

        # residuals independent of x: no step can ever improve
        def residuals(X):
            calls["res"] += 1
            return np.ones((np.atleast_2d(X).shape[0], 4))

        def jacobian(X):
            calls["jac"] += 1
            K = np.atleast_2d(X).shape[0]
            return np.tile(np.eye(4)[:, :2], (K, 1, 1))

        blm = BatchedLevenbergMarquardt(residuals, jacobian,
                                        max_iterations=40, accuracy=1e-12,
                                        reject_patience=5)
        r = blm.run(np.zeros((2, 2)))
        assert all(not res.converged for res in r)
        assert all(res.rms_error == pytest.approx(1.0) for res in r)
        # every round rejects -> X never moves -> ONE Jacobian evaluation
        assert calls["jac"] == 1
        # and the loop stops at the patience, not max_iterations
        assert all(res.iterations <= 5 for res in r)

    def test_converging_start_reports_converged(self):
        t = TestSyntheticProblem
        blm = BatchedLevenbergMarquardt(t._residuals, t._jacobian,
                                        max_iterations=100, accuracy=1e-12)
        r = blm.run(np.asarray([[1.0, 1.0, 0.0]]))[0]
        assert r.converged and r.rms_error < 1e-7


class TestEngineBatched:
    def test_batched_matches_single(self):
        """vmapped residuals/Jacobian must equal per-vector evaluation."""
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        setup = build_benchmark_calibration(num_paths=512, num_factors=2)
        p0 = np.asarray(setup.covariance.initial_parameters)
        p1 = p0 * 1.1
        X = np.stack([p0, p1])
        R = setup.engine.residuals_batched(X)
        np.testing.assert_allclose(R[0], setup.engine.residuals(p0),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(R[1], setup.engine.residuals(p1),
                                   rtol=1e-6, atol=1e-9)
        J = setup.engine.jacobian_batched(X)
        np.testing.assert_allclose(J[0], setup.engine.jacobian(p0),
                                   rtol=1e-5, atol=1e-8)

    def test_multistart_batched_sweep_runs(self):
        """End-to-end: tiny multistart with the batched sweep reaches a
        finite optimum and honors sweep_mode validation."""
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        setup = build_benchmark_calibration(num_paths=512, num_factors=2)
        res = setup.calibrate_multistart(max_starts=5, max_nfev=10,
                                         sweep_mode="batched")
        assert np.all(np.isfinite(res.parameters))
        assert np.isfinite(res.rms_error)
        with pytest.raises(ValueError):
            setup.calibrate_multistart(sweep_mode="nope")


class TestGateNaNSafety:
    def test_gate_rejects_nan_rms(self, monkeypatch):
        """A basin whose rms19 evaluates to NaN must NOT fire the target
        gate (regression: `> target` let NaN fall through and returned
        garbage as a converged result without running any optimizer)."""
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        setup = build_benchmark_calibration(num_paths=512)
        real_dev = setup.deviations
        calls = {"n": 0}

        def nan_then_real(params):
            calls["n"] += 1
            if calls["n"] <= 2:  # the gate-0 and stage-1 gate evaluations
                return np.full(len(setup.products), np.nan)
            return real_dev(params)

        monkeypatch.setattr(setup, "deviations", nan_then_real)
        res = setup.calibrate_multistart(target_rms19=0.5, max_starts=2,
                                         max_nfev=10)
        assert np.isfinite(res.rms_error), \
            "NaN-rms basin was returned by the gate"
        assert calls["n"] > 2, "optimizer never ran past the gate"
