"""Regression tests for review findings (each reproduced as a real failure
before its fix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu import RandomVariableFloat, RandomVariableTPU
from finmath_tpu.models.analytic import black_formula
from finmath_tpu.models.calibration import LevenbergMarquardt
from finmath_tpu.models.lmm.model import black_implied_vol_jnp
from finmath_tpu.ops.precise_math import pow32


class TestPytreeScalarRoundtrip:
    """Deterministic RVs must survive jit/vmap round-trips (previously the
    0-d array leaf flipped is_deterministic and crashed reductions)."""

    def test_jit_identity(self):
        out = jax.jit(lambda rv: rv)(RandomVariableTPU(1.5, 3.0))
        assert out.is_deterministic()
        assert out.size() == 1
        assert out.get_filtration_time() == 1.5
        assert out.mult(2.0).get_average() == pytest.approx(6.0)

    def test_jit_computation(self):
        out = jax.jit(lambda rv: rv.mult(2.0).add(1.0))(RandomVariableTPU(0.0, 3.0))
        assert out.is_deterministic()
        assert out.double_value() == pytest.approx(7.0)

    def test_zero_d_concrete_array_constructor(self):
        rv = RandomVariableTPU(0.0, jnp.float32(2.0))
        assert rv.is_deterministic()
        assert rv.double_value() == 2.0


class TestWeightedQuantileDeterministicProbabilities:
    @pytest.mark.parametrize("cls", [RandomVariableTPU, RandomVariableFloat])
    def test_uniform_weights(self, cls):
        rv = cls(0.0, np.arange(100, dtype=np.float32))
        q = rv.get_quantile(0.5, cls(0.0, 0.01))
        assert 48.0 <= q <= 51.0


class TestLevenbergMarquardtEdges:
    def test_zero_iterations(self):
        lm = LevenbergMarquardt(lambda x: x, lambda x: np.eye(2), max_iterations=0)
        res = lm.run(np.asarray([1.0, 2.0]))
        assert res.iterations == 0
        assert res.rms_error == pytest.approx(np.sqrt(2.5))


class TestPow32Edges:
    def test_zero_base_zero_exponent(self):
        out = np.asarray(pow32(jnp.asarray([0.0, 2.0], jnp.float32), 0.0))
        np.testing.assert_array_equal(out, [1.0, 1.0])

    def test_zero_base_negative_exponent(self):
        out = np.asarray(pow32(jnp.asarray([0.0], jnp.float32), -1.0))
        assert np.isinf(out[0])


class TestBlackInversionDeepITM:
    """erf-based tail probabilities stalled Newton for deep-ITM quotes
    (0.10335 instead of 0.10000 on TPU); erfc fixed it."""

    def test_deep_itm_exact(self):
        f, k, t = 0.03, 0.01, 5.0
        for vol in (0.10, 0.30):
            v = black_formula(f, k, vol, t, 1.0)
            got = float(black_implied_vol_jnp(
                jnp.float64(v), jnp.float64(f), jnp.float64(k),
                jnp.float64(t), jnp.float64(1.0)))
            assert got == pytest.approx(vol, rel=1e-6)

    def test_sub_resolution_time_value_maps_to_zero(self):
        # vol 0.05 at this moneyness has time value ~5e-25 — below float
        # resolution of the quote; 0 is the only defensible answer
        f, k, t = 0.03, 0.01, 5.0
        v = black_formula(f, k, 0.05, t, 1.0)
        got = float(black_implied_vol_jnp(
            jnp.float64(v), jnp.float64(f), jnp.float64(k),
            jnp.float64(t), jnp.float64(1.0)))
        assert got == 0.0

    def test_at_intrinsic_returns_zero(self):
        got = float(black_implied_vol_jnp(
            jnp.float64(0.02), jnp.float64(0.03), jnp.float64(0.01),
            jnp.float64(5.0), jnp.float64(1.0)))
        assert got == 0.0

    def test_below_intrinsic_returns_zero(self):
        got = float(black_implied_vol_jnp(
            jnp.float64(0.015), jnp.float64(0.03), jnp.float64(0.01),
            jnp.float64(5.0), jnp.float64(1.0)))
        assert got == 0.0
