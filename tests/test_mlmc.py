"""Multilevel Monte Carlo tests (finmath_tpu/models/mlmc.py):
telescoping consistency, level variance/mean decay, and convergence to
the continuous-monitoring closed form."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from finmath_tpu.models.analytic import lookback_floating_strike_value
from finmath_tpu.models.mlmc import (
    MLMCResult,
    _lookback_level_kernel,
    mlmc_lookback_call,
)
from finmath_tpu.ops.random_variable import FLOAT_DTYPE

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0


@pytest.fixture(scope="module")
def result() -> MLMCResult:
    return mlmc_lookback_call(S0, R, SIG, T, eps=0.08, n_pilot=10_000,
                              seed=7)


class TestMLMC:
    def test_converges_to_continuous_closed_form(self, result):
        an = lookback_floating_strike_value(S0, R, SIG, T, True)
        # RMS target eps: bias + sampling noise. The BGK shift leaves
        # an O(dt) residual slightly above the gamma=1 model, hence
        # the 2.5x band
        assert abs(result.value - an) < 2.5 * 0.08

    def test_level_variances_decay(self, result):
        v = result.level_vars
        assert len(v) >= 4
        # strong convergence: each refinement at least ~halves Var(Y_l)
        for a, b in zip(v[1:-1], v[2:]):
            assert b < 0.85 * a

    def test_level_means_decay(self, result):
        m = [abs(x) for x in result.level_means[1:]]
        assert m[-1] < m[0]

    def test_samples_concentrate_on_coarse_levels(self, result):
        assert result.samples[0] > 5 * result.samples[-1]

    def test_telescoping_consistency(self):
        # sum of correction means through level L == direct fine-grid
        # estimate at level L (same coupling kernel, independent seeds)
        key = jax.random.PRNGKey(3)
        args = (jnp.asarray(S0, FLOAT_DTYPE), jnp.asarray(R, FLOAT_DTYPE),
                jnp.asarray(SIG, FLOAT_DTYPE), jnp.asarray(T, FLOAT_DTYPE))
        n = 400_000
        m0 = 4
        total = 0.0
        for lv in range(0, 4):
            coarse = m0 * 2 ** max(lv - 1, 0)
            out = np.asarray(_lookback_level_kernel(
                jax.random.fold_in(key, lv), n, coarse, lv == 0, *args))
            total += out[0] / n
        # direct estimate of E[P^(32 steps)]: level-3 kernel's fine sums
        out3 = np.asarray(_lookback_level_kernel(
            jax.random.fold_in(key, 99), n, m0 * 2 ** 2, False, *args))
        direct = out3[2] / n
        se = math.sqrt(out3[3] / n - direct ** 2) / math.sqrt(n)
        assert abs(total - direct) < 6 * se

    def test_cheaper_than_single_level(self, result):
        # single-level at the finest grid would need all samples there:
        # N_total * steps_L; MLMC's cost proxy must be far below
        fine_steps = 4 * 2 ** (len(result.levels) - 1)
        n_needed = sum(result.samples)
        assert result.total_fine_steps < 0.5 * n_needed * fine_steps
