"""Finite-difference layer: theta-scheme prices vs closed forms, the CRR
binomial American oracle, MC cross-checks, batching, and AD Greeks.

Mirrors finmath-lib's finitedifference test intent (BS call via
FDMThetaMethod matching the analytic value) and extends it: CEV limit,
American put vs binomial, digital with Rannacher, local-vol PDE vs the
MC local-vol engine on the same SSVI surface, and grad-through-solver
vega."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.american import crr_american_price
from finmath_tpu.models.pde import (
    FDMAmericanPutOption,
    FDMBlackScholesModel,
    FDMConstantElasticityOfVarianceModel,
    FDMDigitalOption,
    FDMEuropeanCallOption,
    FDMEuropeanPutOption,
    FDMLocalVolatilityModel,
    fdm_black_scholes_prices,
    theta_scheme_solve,
)

S0, R, SIGMA, T, K = 100.0, 0.05, 0.30, 1.0, 110.0


def _bs_model(nt=200, nx=400, theta=0.5):
    return FDMBlackScholesModel(
        num_timesteps=nt, num_spacesteps=nx, num_standard_deviations=8.0,
        center=S0, theta=theta, initial_value=S0, risk_free_rate=R,
        volatility=SIGMA)


class TestEuropeanBlackScholes:
    def test_call_matches_closed_form(self):
        value = FDMEuropeanCallOption(T, K).value(_bs_model())
        expected = black_scholes_option_value(S0, R, SIGMA, T, K, True)
        assert abs(value - expected) < 2e-3 * expected

    def test_put_matches_closed_form(self):
        value = FDMEuropeanPutOption(T, K).value(_bs_model())
        expected = black_scholes_option_value(S0, R, SIGMA, T, K, False)
        assert abs(value - expected) < 2e-3 * expected

    def test_grid_convergence_second_order(self):
        # Crank-Nicolson + Rannacher: error should drop ~4x per halving
        expected = black_scholes_option_value(S0, R, SIGMA, T, K, True)
        errs = []
        for nt, nx in [(50, 100), (100, 200), (200, 400)]:
            v = FDMEuropeanCallOption(T, K).value(_bs_model(nt, nx))
            errs.append(abs(v - expected))
        assert errs[1] < 0.5 * errs[0]
        assert errs[2] < 0.5 * errs[1]
        assert errs[2] < 5e-3

    def test_get_value_returns_grids(self):
        spots, values = FDMEuropeanCallOption(T, K).get_value(
            0.0, _bs_model())
        assert spots.shape == values.shape == (401,)
        assert np.all(np.diff(spots) > 0)
        # deep ITM ~ S - K e^{-rT}, deep OTM ~ 0
        assert values[-1] == pytest.approx(
            spots[-1] - K * math.exp(-R * T), rel=2e-3)
        assert values[0] < 1e-6

    def test_digital_with_rannacher_smoothing(self):
        model = _bs_model(nt=400, nx=800)
        value = FDMDigitalOption(T, K).value(model)
        d2 = ((math.log(S0 / K) + (R - 0.5 * SIGMA ** 2) * T)
              / (SIGMA * math.sqrt(T)))
        from statistics import NormalDist
        expected = math.exp(-R * T) * NormalDist().cdf(d2)
        assert abs(value - expected) < 2e-3


class TestAmerican:
    def test_american_put_matches_binomial(self):
        value = FDMAmericanPutOption(T, K).value(_bs_model(400, 800))
        oracle = crr_american_price(S0, R, SIGMA, T, K, is_call=False,
                                    num_steps=4000)
        assert abs(value - oracle) < 2e-3 * oracle

    def test_american_geq_european_put(self):
        model = _bs_model()
        am = FDMAmericanPutOption(T, K).value(model)
        eu = FDMEuropeanPutOption(T, K).value(model)
        assert am > eu

    def test_american_call_no_dividends_equals_european(self):
        from finmath_tpu.models.pde import FDMAmericanCallOption

        model = _bs_model()
        am = FDMAmericanCallOption(T, K).value(model)
        eu = FDMEuropeanCallOption(T, K).value(model)
        assert abs(am - eu) < 2e-3 * eu


class TestCEV:
    def test_beta_one_reduces_to_black_scholes(self):
        model = FDMConstantElasticityOfVarianceModel(
            num_timesteps=200, num_spacesteps=600,
            num_standard_deviations=8.0, center=S0, theta=0.5,
            initial_value=S0, risk_free_rate=R, volatility=SIGMA / S0 ** 0.0,
            exponent=1.0)
        # beta=1: sigma is lognormal vol directly
        value = FDMEuropeanCallOption(T, K).value(model)
        expected = black_scholes_option_value(S0, R, SIGMA, T, K, True)
        assert abs(value - expected) < 4e-3 * expected

    def test_beta_below_one_skews_puts_richer(self):
        # CEV beta<1: fatter left tail at matched ATM vol level ->
        # OTM puts worth more than lognormal at the same sigma*S0^(beta-1)
        beta = 0.5
        sigma_cev = SIGMA * S0 ** (1.0 - beta)
        model = FDMConstantElasticityOfVarianceModel(
            num_timesteps=200, num_spacesteps=600,
            num_standard_deviations=8.0, center=S0, theta=0.5,
            initial_value=S0, risk_free_rate=R, volatility=sigma_cev,
            exponent=beta)
        k_otm = 80.0
        put_cev = FDMEuropeanPutOption(T, k_otm).value(model)
        put_bs = black_scholes_option_value(S0, R, SIGMA, T, k_otm, False)
        assert put_cev > put_bs


class TestBatchedStrip:
    def test_strike_strip_single_solve(self):
        strikes = [70.0, 85.0, 100.0, 115.0, 130.0]
        got = fdm_black_scholes_prices(S0, R, SIGMA, T, strikes)
        expected = [black_scholes_option_value(S0, R, SIGMA, T, k, True)
                    for k in strikes]
        np.testing.assert_allclose(got, expected, rtol=4e-3, atol=2e-3)

    def test_vol_ladder_times_strikes(self):
        strikes = jnp.asarray([90.0, 100.0, 110.0])
        vols = jnp.asarray([[0.15], [0.30], [0.45]])
        got = fdm_black_scholes_prices(S0, R, vols, T, strikes)
        assert got.shape == (3, 3)
        for i, v in enumerate([0.15, 0.30, 0.45]):
            for j, k in enumerate([90.0, 100.0, 110.0]):
                expected = black_scholes_option_value(S0, R, v, T, k, True)
                assert abs(got[i, j] - expected) < 6e-3 * max(expected, 1.0)

    def test_american_strip(self):
        strikes = [100.0, 120.0]
        got = fdm_black_scholes_prices(S0, R, SIGMA, T, strikes,
                                       is_call=False, american=True,
                                       num_timesteps=400,
                                       num_spacesteps=800)
        for k, v in zip(strikes, got):
            oracle = crr_american_price(S0, R, SIGMA, T, k, is_call=False,
                                        num_steps=2000)
            assert abs(v - oracle) < 3e-3 * oracle


class TestGreeksThroughSolver:
    def test_vega_by_autodiff_matches_closed_form(self):
        def price(sigma):
            x = jnp.linspace(math.log(S0) - 3.0, math.log(S0) + 3.0, 401)
            spots = jnp.exp(x)
            terminal = jnp.maximum(spots - K, 0.0)

            def coeff_fn(t):
                del t
                return (jnp.full_like(x, R) - 0.5 * sigma ** 2,
                        jnp.full_like(x, 1.0) * sigma ** 2,
                        jnp.full_like(x, R))

            v = theta_scheme_solve(x, terminal, coeff_fn, T, 100)
            xq = math.log(S0)
            idx = jnp.searchsorted(x, xq) - 1
            w = (xq - x[idx]) / (x[idx + 1] - x[idx])
            return v[idx] * (1 - w) + v[idx + 1] * w

        vega = jax.grad(price)(jnp.asarray(SIGMA))
        sqrt_t = math.sqrt(T)
        d1 = ((math.log(S0 / K) + (R + 0.5 * SIGMA ** 2) * T)
              / (SIGMA * sqrt_t))
        expected = S0 * math.exp(-0.5 * d1 ** 2) / math.sqrt(
            2 * math.pi) * sqrt_t
        assert abs(float(vega) - expected) < 2e-2 * expected


class TestExecutionPaths:
    """coeffs= fast path, backend pinning, and outer-jit inlining must
    all agree with the reference coeff_fn path bit-for-bit (same
    arithmetic, different packaging)."""

    def _inputs(self):
        x = np.linspace(math.log(S0) - 2.4, math.log(S0) + 2.4, 201)
        spots = np.exp(x)
        terminal = np.maximum(spots - K, 0.0)
        mu = np.full_like(x, R - 0.5 * SIGMA ** 2)
        sig2 = np.full_like(x, SIGMA ** 2)
        r = np.full_like(x, R)
        return x, spots, terminal, (mu, sig2, r)

    def test_coeffs_path_matches_coeff_fn_path(self):
        x, spots, terminal, coeffs = self._inputs()

        def coeff_fn(t):
            del t
            return tuple(jnp.asarray(c) for c in coeffs)

        via_fn = theta_scheme_solve(x, terminal, coeff_fn, T, 60,
                                    underlying=spots)
        via_arrays = theta_scheme_solve(x, terminal, None, T, 60,
                                        underlying=spots, coeffs=coeffs)
        np.testing.assert_allclose(np.asarray(via_fn),
                                   np.asarray(via_arrays), rtol=1e-12)

    def test_backend_pinning_agrees(self):
        x, spots, terminal, coeffs = self._inputs()
        kw = dict(underlying=spots, coeffs=coeffs)
        v_auto = theta_scheme_solve(x, terminal, None, T, 60, **kw)
        v_cpu = theta_scheme_solve(x, terminal, None, T, 60,
                                   backend="cpu", **kw)
        v_dev = theta_scheme_solve(x, terminal, None, T, 60,
                                   backend=None, **kw)
        np.testing.assert_allclose(np.asarray(v_cpu), np.asarray(v_auto),
                                   rtol=1e-12)
        # CPU vs device may differ in f64-emulation rounding only
        np.testing.assert_allclose(np.asarray(v_dev), np.asarray(v_cpu),
                                   rtol=1e-9)

    def test_inlines_into_outer_jit(self):
        x, spots, terminal, coeffs = self._inputs()

        @jax.jit
        def solve(term):
            return theta_scheme_solve(jnp.asarray(x), term, None, T, 60,
                                      underlying=jnp.asarray(spots),
                                      coeffs=tuple(jnp.asarray(c)
                                                   for c in coeffs))

        inner = solve(jnp.asarray(terminal))
        outer = theta_scheme_solve(x, terminal, None, T, 60,
                                   underlying=spots, coeffs=coeffs)
        np.testing.assert_allclose(np.asarray(inner), np.asarray(outer),
                                   rtol=1e-9)


class TestLocalVolPDE:
    def test_flat_ssvi_surface_reduces_to_black_scholes(self):
        from finmath_tpu.models.local_vol import SSVISurface

        # sigma0 == sigma_inf and eta = 0: w(k,t) = SIGMA^2 t exactly
        surface = SSVISurface(sigma0=SIGMA, sigma_inf=SIGMA, tau=1.0,
                              rho=0.0, eta=0.0, gamma=0.5)
        model = FDMLocalVolatilityModel(
            num_timesteps=200, num_spacesteps=400,
            num_standard_deviations=8.0, theta=0.5, initial_value=S0,
            risk_free_rate=R, surface=surface, reference_vol=SIGMA)
        value = FDMEuropeanCallOption(T, K).value(model)
        expected = black_scholes_option_value(S0, R, SIGMA, T, K, True)
        assert abs(value - expected) < 4e-3 * expected

    def test_skewed_surface_matches_mc_engine(self):
        from finmath_tpu.models.local_vol import (
            LocalVolatilityModel, MonteCarloLocalVolModel, SSVISurface,
            european_call_values)
        from finmath_tpu.models.time_discretization import (
            TimeDiscretization)

        surface = SSVISurface(sigma0=0.22, sigma_inf=0.32, tau=1.2,
                              rho=-0.55, eta=0.8, gamma=0.45)
        surface.validate(2.0)
        pde_model = FDMLocalVolatilityModel(
            num_timesteps=200, num_spacesteps=400,
            num_standard_deviations=9.0, theta=0.5, initial_value=S0,
            risk_free_rate=R, surface=surface, reference_vol=0.35)
        strikes = [90.0, 100.0, 110.0]
        pde = [FDMEuropeanCallOption(T, k).value(pde_model)
               for k in strikes]

        td = TimeDiscretization(initial=0.0, num_steps=100, step=T / 100)
        lv = LocalVolatilityModel(S0, R, surface, td)
        mc_model = MonteCarloLocalVolModel(td, num_paths=200_000,
                                           model=lv, seed=4242)
        mc = np.asarray(european_call_values(mc_model, strikes, [T]))
        values, stderr = mc[0, :, 0], mc[0, :, 1]
        # PDE is the noise-free oracle: must land within ~4 MC sigma
        np.testing.assert_array_less(np.abs(np.asarray(pde) - values),
                                     4.0 * stderr + 0.02)
