"""End-to-end f32 <-> f64 price parity at 1e-6 relative — the north star.

BASELINE.md's contract: "prices within 1e-6 relative of double-precision
CPU". The engines are dtype-parameterized; the float64 mode consumes the
IDENTICAL float32 Brownian stream (model.py draws normals in float32 and
upcasts), so these comparisons isolate ARITHMETIC error from Monte-Carlo
noise — the same oracle philosophy as the reference's bit-compatible CPU
float class (RandomVariableCuda.java:67-68), tightened from op-level to
whole-valuation level.
"""

import jax.numpy as jnp
import numpy as np
import pytest

TOL = 1e-6  # relative; the north-star contract


class TestPriceParity1e6:
    def test_black_scholes_mc_f32_vs_f64(self):
        from finmath_tpu.models.black_scholes import mc_european_call_price

        args = (7, 500_000, 50, 1.0, 0.05, 0.30, 1.0, 1.05)
        p32 = mc_european_call_price(*args)
        p64 = mc_european_call_price(*args, dtype=jnp.float64)
        assert abs(p32 - p64) / abs(p64) < TOL

    def test_lmm_swaption_values_f32_vs_f64(self):
        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

        s32 = build_atm_calibration(num_paths=20_000, num_factors=1, seed=31415)
        s64 = build_atm_calibration(num_paths=20_000, num_factors=1, seed=31415,
                                    dtype=jnp.float64)
        p0 = s32.covariance.initial_parameters
        v32 = np.asarray(s32.engine.values(p0))
        v64 = np.asarray(s64.engine.values(p0))
        rel = np.abs(v32 - v64) / np.abs(v64)
        # every one of the ~144 swaption prices within 1e-6 relative
        assert float(rel.max()) < TOL, f"max rel dev {rel.max():.3e}"

    def test_lmm_stochvol_values_f32_vs_f64(self):
        """The benchmark model (blended local vol + stochastic vol,
        lognormal quotes) holds the same parity."""
        from finmath_tpu.models.lmm.benchmark_calibration import (
            build_benchmark_calibration,
        )

        s32 = build_benchmark_calibration(num_paths=8_192, seed=314151)
        s64 = build_benchmark_calibration(num_paths=8_192, seed=314151,
                                          dtype=jnp.float64)
        assert s64.engine.dtype == np.dtype(np.float64)
        p0 = s32.covariance.initial_parameters
        v32 = np.asarray(s32.engine.values(p0))
        v64 = np.asarray(s64.engine.values(p0))
        rel = np.abs(v32 - v64) / np.abs(v64)
        assert float(rel.max()) < TOL, f"max rel dev {rel.max():.3e}"

    def test_f64_mode_actually_differs_in_dtype(self):
        """Guard: the oracle mode really stores f64 paths (not a silently
        ignored flag)."""
        from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration

        s64 = build_atm_calibration(num_paths=1_000, num_factors=1,
                                    dtype=jnp.float64)
        assert s64.engine.dtype == np.dtype(np.float64)
        s32 = build_atm_calibration(num_paths=1_000, num_factors=1)
        assert s32.engine.dtype == np.dtype(np.float32)
