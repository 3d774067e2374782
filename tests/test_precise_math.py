"""Accuracy tests for the ~1-ULP float32 transcendentals.

These are the TPU-native replacement for CUDA's accurate libdevice
logf/expf; see finmath_tpu/ops/precise_math.py. Verified against float64
NumPy ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.ops.precise_math import exp32, expm1_32, log1p_32, log32, pow32


def max_ulp_error(got_f32: np.ndarray, exact_f64: np.ndarray) -> float:
    ulp = np.abs(np.spacing(exact_f64.astype(np.float32))).astype(np.float64)
    return float((np.abs(got_f32.astype(np.float64) - exact_f64) / ulp).max())


class TestLog32:
    def test_accuracy_wide_range(self):
        rng = np.random.default_rng(1)
        v = np.concatenate([
            (1e-6 + 10.0 * rng.random(100_000)).astype(np.float32),
            np.float32(2.0) ** rng.uniform(-30, 30, 50_000).astype(np.float32),
        ])
        got = np.asarray(jax.jit(log32)(v))
        exact = np.log(v.astype(np.float64))
        assert max_ulp_error(got, exact) < 1.5

    def test_edge_cases(self):
        vals = np.asarray([0.0, -0.0, -1.0, np.inf, -np.inf, np.nan, 1e-40, 1.0],
                          dtype=np.float32)
        got = np.asarray(log32(jnp.asarray(vals)))
        assert got[0] == -np.inf and got[1] == -np.inf
        assert np.isnan(got[2]) and np.isnan(got[4]) and np.isnan(got[5])
        assert got[3] == np.inf
        assert got[6] == pytest.approx(np.log(1e-40), rel=1e-6)  # subnormal
        assert got[7] == 0.0


class TestExp32:
    def test_accuracy_wide_range(self):
        rng = np.random.default_rng(2)
        w = rng.uniform(-87, 88, 200_000).astype(np.float32)
        got = np.asarray(jax.jit(exp32)(w))
        exact = np.exp(w.astype(np.float64))
        assert max_ulp_error(got, exact) < 1.5

    def test_edge_cases(self):
        vals = np.asarray([-1000.0, 1000.0, np.nan, 0.0], dtype=np.float32)
        got = np.asarray(exp32(jnp.asarray(vals)))
        assert got[0] == 0.0
        assert got[1] == np.inf
        assert np.isnan(got[2])
        assert got[3] == 1.0

    def test_exp_log_inverse(self):
        rng = np.random.default_rng(3)
        v = (0.01 + 10.0 * rng.random(50_000)).astype(np.float32)
        roundtrip = np.asarray(exp32(log32(jnp.asarray(v))))
        np.testing.assert_allclose(roundtrip, v, rtol=3e-7)


class TestPow32:
    def test_accuracy(self):
        rng = np.random.default_rng(4)
        x = (0.1 + 2.0 * rng.random(50_000)).astype(np.float32)
        for p in [0.5, 1.5, 2.0, -1.0, 3.0]:
            got = np.asarray(pow32(jnp.asarray(x), p)).astype(np.float64)
            exact = np.power(x.astype(np.float64), p)
            rel = np.abs(got - exact) / np.abs(exact)
            assert rel.max() < 1e-6, f"pow {p}: {rel.max()}"


class TestSmallArgument:
    def test_expm1(self):
        s = np.random.default_rng(5).uniform(-0.009, 0.009, 50_000).astype(np.float32)
        got = np.asarray(expm1_32(jnp.asarray(s))).astype(np.float64)
        exact = np.expm1(s.astype(np.float64))
        assert (np.abs(got - exact) / np.abs(exact)).max() < 3e-7

    def test_log1p(self):
        s = np.random.default_rng(6).uniform(-0.009, 0.009, 50_000).astype(np.float32)
        got = np.asarray(log1p_32(jnp.asarray(s))).astype(np.float64)
        exact = np.log1p(s.astype(np.float64))
        assert (np.abs(got - exact) / np.abs(exact)).max() < 3e-7
