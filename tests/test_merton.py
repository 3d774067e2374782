"""Merton jump-diffusion tests (finmath_tpu/models/merton.py).

Oracle strategy mirrors the framework's: the exact Poisson-mixture
series is the analytic oracle (itself validated against Black-Scholes
in the no-jump limit and by put-call parity), the fused MC engine is
validated against the series within Monte-Carlo error, the branchless
Poisson sampler against the analytic pmf, and the f64 oracle mode runs
on the identical draw stream."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.black_scholes import EuropeanOption
from finmath_tpu.models.merton import (
    MertonParams,
    MonteCarloMertonModel,
    _poisson_icdf_branchless,
    calibrate_merton,
    mc_merton_european_prices,
    merton_series_prices,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

P = MertonParams(initial_value=100.0, risk_free_rate=0.05, volatility=0.2,
                 jump_intensity=0.6, jump_size_mean=-0.15,
                 jump_size_std=0.25)
STRIKES = np.array([80.0, 90.0, 100.0, 110.0, 125.0])
T = 1.0


class TestSeries:
    def test_no_jumps_reduces_to_black_scholes(self):
        p = MertonParams(100.0, 0.05, 0.2, jump_intensity=0.0,
                         jump_size_mean=0.0, jump_size_std=0.0)
        got = merton_series_prices(p, T, STRIKES)
        want = [black_scholes_option_value(100.0, 0.05, 0.2, T, k)
                for k in STRIKES]
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_put_call_parity(self):
        calls = merton_series_prices(P, T, STRIKES, is_call=True)
        puts = merton_series_prices(P, T, STRIKES, is_call=False)
        df = math.exp(-P.risk_free_rate * T)
        np.testing.assert_allclose(calls - puts,
                                   P.initial_value - STRIKES * df,
                                   rtol=1e-10)

    def test_shape_constraints(self):
        c = merton_series_prices(P, T, STRIKES)
        assert np.all(np.diff(c) < 0)              # decreasing in strike
        df = math.exp(-P.risk_free_rate * T)
        intrinsic = np.maximum(P.initial_value - STRIKES * df, 0.0)
        assert np.all(c > intrinsic)               # above European intrinsic
        assert np.all(c < P.initial_value)

    def test_jumps_add_value_to_otm_options(self):
        # jump risk fattens the tails: deep-OTM calls gain vs pure BS
        bs = black_scholes_option_value(100.0, 0.05, 0.2, T, 140.0)
        mert = merton_series_prices(P, T, [140.0])[0]
        assert mert > bs

    def test_weights_are_normalized_mixture(self):
        # price must equal the direct Poisson mixture with TRUE
        # probabilities and rate-shifted discounting — the identity the
        # lam'-weight form compresses (guards the double-counting bug)
        p = P
        lam, a, b = p.jump_intensity, p.jump_size_mean, p.jump_size_std
        kappa = p.jump_compensator
        direct = np.zeros_like(STRIKES)
        for n in range(60):
            pn = math.exp(-lam * T) * (lam * T) ** n / math.factorial(n)
            sig_n = math.sqrt(p.volatility ** 2 + n * b * b / T)
            r_n = p.risk_free_rate - lam * kappa + n * (a + 0.5 * b * b) / T
            bs = np.array([black_scholes_option_value(
                p.initial_value, r_n, sig_n, T, k) for k in STRIKES])
            direct += pn * math.exp((r_n - p.risk_free_rate) * T) * bs
        np.testing.assert_allclose(merton_series_prices(p, T, STRIKES),
                                   direct, rtol=1e-10)


class TestPoissonSampler:
    def test_matches_analytic_pmf(self):
        lam_dt = 0.35
        n = 200_000
        u = jnp.asarray(np.random.default_rng(7).random(n))
        counts = np.asarray(_poisson_icdf_branchless(u, jnp.float64(lam_dt),
                                                     16))
        pmf = np.array([math.exp(-lam_dt) * lam_dt ** k / math.factorial(k)
                        for k in range(6)])
        emp = np.array([(counts == k).mean() for k in range(6)])
        # binomial stderr ~ sqrt(p/n) <= 1.2e-3; allow 4 sigma
        np.testing.assert_allclose(emp, pmf, atol=5e-3)
        assert counts.min() >= 0 and counts.max() <= 16

    def test_zero_intensity_never_jumps(self):
        u = jnp.asarray(np.linspace(1e-6, 1 - 1e-6, 1001))
        counts = np.asarray(_poisson_icdf_branchless(u, jnp.float64(0.0), 16))
        assert np.all(counts == 0)

    def test_large_lam_dt_guard(self):
        with pytest.raises(ValueError, match="jump cap"):
            mc_merton_european_prices(P, 10.0, [100.0], num_paths=8,
                                      num_steps=2)


class TestMonteCarlo:
    @pytest.fixture(scope="class")
    def mc(self):
        return mc_merton_european_prices(P, T, STRIKES, num_paths=400_000,
                                         num_steps=8, antithetic=True,
                                         seed=11)

    def test_matches_series(self, mc):
        px, fwd = mc
        ref = merton_series_prices(P, T, STRIKES)
        np.testing.assert_allclose(px, ref, rtol=8e-3)

    def test_martingale(self, mc):
        _, fwd = mc
        assert abs(fwd - P.initial_value) < 0.12

    def test_f64_oracle_same_stream(self):
        k = np.array([100.0])
        p32, _ = mc_merton_european_prices(P, T, k, num_paths=100_000,
                                           num_steps=8, seed=5)
        p64, _ = mc_merton_european_prices(P, T, k, num_paths=100_000,
                                           num_steps=8, seed=5,
                                           dtype=jnp.float64)
        # identical jump decisions and normals; only f32 arithmetic differs
        np.testing.assert_allclose(p32, p64, rtol=5e-5)

    def test_few_steps_unbiased(self):
        # the scheme is exact in distribution: 2 steps and 32 steps agree
        # up to MC noise, NOT up to an Euler bias ~ O(dt)
        k = np.array([100.0])
        ref = merton_series_prices(P, T, k)[0]
        p2, _ = mc_merton_european_prices(P, T, k, num_paths=400_000,
                                          num_steps=2, antithetic=True,
                                          seed=3)
        p32, _ = mc_merton_european_prices(P, T, k, num_paths=400_000,
                                           num_steps=32, antithetic=True,
                                           seed=3)
        assert abs(p2[0] - ref) / ref < 8e-3
        assert abs(p32[0] - ref) / ref < 8e-3

    def test_antithetic_parity_check(self):
        with pytest.raises(ValueError, match="even"):
            mc_merton_european_prices(P, T, [100.0], num_paths=101,
                                      antithetic=True)


class TestObjectAPI:
    def test_european_option_product(self):
        td = TimeDiscretization(initial=0.0, num_steps=8, step=T / 8)
        model = MonteCarloMertonModel(td, 200_000, P, seed=9)
        got = EuropeanOption(T, 100.0).get_value(model)
        ref = merton_series_prices(P, T, [100.0])[0]
        assert abs(got - ref) / ref < 1.5e-2

    def test_off_grid_time_raises(self):
        td = TimeDiscretization(initial=0.0, num_steps=8, step=T / 8)
        model = MonteCarloMertonModel(td, 100, P)
        with pytest.raises(ValueError, match="grid"):
            model.get_asset_value(0.33)

    def test_asset_value_filtration_time(self):
        td = TimeDiscretization(initial=0.0, num_steps=8, step=T / 8)
        model = MonteCarloMertonModel(td, 1000, P)
        rv = model.get_asset_value(0.5)
        assert rv.get_filtration_time() == 0.5
        assert rv.size() == 1000


class TestCalibration:
    def test_recovers_synthetic_surface(self):
        truth = MertonParams(100.0, 0.03, volatility=0.17,
                             jump_intensity=0.8, jump_size_mean=-0.1,
                             jump_size_std=0.18)
        mats = [0.5, 1.0, 2.0]
        ks = [[90.0, 100.0, 110.0]] * 3
        targets = [merton_series_prices(truth, t, k)
                   for t, k in zip(mats, ks)]
        res = calibrate_merton(100.0, 0.03, mats, ks, targets)
        assert res.rms_price_error < 1e-6
        assert abs(res.params.volatility - 0.17) < 1e-3
        assert abs(res.params.jump_intensity - 0.8) < 0.05

    def test_param_validation(self):
        with pytest.raises(ValueError):
            MertonParams(100.0, 0.03, volatility=-0.1, jump_intensity=0.5,
                         jump_size_mean=0.0, jump_size_std=0.1)
        with pytest.raises(ValueError):
            MertonParams(100.0, 0.03, volatility=0.2, jump_intensity=-0.5,
                         jump_size_mean=0.0, jump_size_std=0.1)
