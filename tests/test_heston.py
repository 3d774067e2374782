"""Heston model tests (finmath_tpu/models/heston.py).

Strategy mirrors the framework's pattern for every model family: the
semi-analytic characteristic-function pricer is the f64 oracle (checked
against its OWN independent limits — Black-Scholes at xi->0, put-call
parity, monotonicity), the fused MC engines are validated against it
statistically (QE at coarse steps, full-truncation Euler at fine steps),
the martingale/variance diagnostics against closed forms, the f32/f64
parity contract on the identical draw stream, the object API against
the fused engine, and calibration as a parameter round-trip."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from finmath_tpu.models.analytic import black_scholes_option_value
from finmath_tpu.models.brownian_motion import BrownianMotion
from finmath_tpu.models.heston import (
    HestonModel,
    HestonParams,
    calibrate_heston,
    heston_characteristic_prices,
    mc_heston_european_prices,
)
from finmath_tpu.models.process import EulerScheme
from finmath_tpu.models.time_discretization import TimeDiscretization

P = HestonParams(initial_value=100.0, risk_free_rate=0.03, v0=0.04,
                 kappa=1.5, theta=0.05, xi=0.4, rho=-0.6)
STRIKES = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
T = 1.0


@pytest.fixture(scope="module")
def cf_prices():
    return heston_characteristic_prices(P, T, STRIKES)


class TestCharacteristicFunctionPricer:
    def test_black_scholes_limit(self):
        """xi -> 0 with v0 = theta: variance is constant, Heston = BS
        with sigma = sqrt(v0). At rho = 0 the leading correction is
        O(xi^2); a correlated test would see the genuine O(xi) skew
        term (measured: 5.5e-5 at xi = 1e-4, rho = -0.3 — linear in xi,
        i.e. physics, not quadrature error)."""
        p = HestonParams(initial_value=100.0, risk_free_rate=0.03,
                         v0=0.04, kappa=1.0, theta=0.04, xi=1e-4,
                         rho=0.0)
        got = heston_characteristic_prices(p, T, STRIKES)
        want = [black_scholes_option_value(100.0, 0.03, 0.2, T, k)
                for k in STRIKES]
        np.testing.assert_allclose(got, want, rtol=1e-7)

    def test_put_call_parity(self, cf_prices):
        puts = heston_characteristic_prices(P, T, STRIKES, is_call=False)
        df = math.exp(-P.risk_free_rate * T)
        np.testing.assert_allclose(
            cf_prices - puts, P.initial_value - STRIKES * df, rtol=1e-12)

    def test_monotone_and_bounded(self, cf_prices):
        df = math.exp(-P.risk_free_rate * T)
        assert np.all(np.diff(cf_prices) < 0)  # decreasing in strike
        lower = np.maximum(P.initial_value - STRIKES * df, 0.0)
        assert np.all(cf_prices > lower)
        assert np.all(cf_prices < P.initial_value)

    def test_quadrature_converged(self):
        a = heston_characteristic_prices(P, T, STRIKES, num_nodes=256)
        b = heston_characteristic_prices(P, T, STRIKES, num_nodes=512,
                                         upper=600.0)
        np.testing.assert_allclose(a, b, rtol=1e-9)

    def test_long_maturity_branch_stability(self):
        """The little-Heston-trap formulation must stay on the principal
        branch at long maturities (the classic failure is wild prices
        beyond ~5y)."""
        prices = heston_characteristic_prices(P, 15.0, STRIKES)
        df = math.exp(-P.risk_free_rate * 15.0)
        lower = np.maximum(P.initial_value - STRIKES * df, 0.0)
        assert np.all(prices > lower) and np.all(
            prices < P.initial_value)
        assert np.all(np.diff(prices) < 0)

    def test_validation(self):
        with pytest.raises(ValueError, match="maturity"):
            heston_characteristic_prices(P, 0.0, STRIKES)
        with pytest.raises(ValueError, match="strikes"):
            heston_characteristic_prices(P, 1.0, [-5.0])

    def test_params_validation(self):
        with pytest.raises(ValueError, match="rho"):
            HestonParams(100.0, 0.0, 0.04, 1.0, 0.04, 0.5, 1.0)
        with pytest.raises(ValueError, match="positive"):
            HestonParams(100.0, 0.0, -0.04, 1.0, 0.04, 0.5, 0.0)
        with pytest.raises(ValueError, match="initial_value"):
            HestonParams(0.0, 0.0, 0.04, 1.0, 0.04, 0.5, 0.0)

    def test_feller_ratio(self):
        assert P.feller_ratio == pytest.approx(
            2 * P.kappa * P.theta / P.xi ** 2)


class TestMonteCarloEngines:
    def test_qe_matches_cf(self, cf_prices):
        """Andersen QE-M at a COARSE grid (16 steps/year) — the scheme's
        selling point is near-exact marginals at large steps."""
        mc, fwd, _ = mc_heston_european_prices(
            P, T, STRIKES, num_paths=120_000, num_steps=16,
            scheme="qe", antithetic=True)
        np.testing.assert_allclose(mc, cf_prices, atol=0.12)
        assert abs(fwd - P.initial_value) < 0.15

    def test_euler_matches_cf(self, cf_prices):
        mc, fwd, _ = mc_heston_european_prices(
            P, T, STRIKES, num_paths=120_000, num_steps=128,
            scheme="euler", antithetic=True)
        np.testing.assert_allclose(mc, cf_prices, atol=0.15)
        assert abs(fwd - P.initial_value) < 0.2

    def test_expected_variance_matches_cir_mean(self):
        """E[V_T] = theta + (v0 - theta) e^{-kappa T} exactly under CIR;
        QE preserves the conditional mean by construction."""
        _, _, ev = mc_heston_european_prices(
            P, T, [100.0], num_paths=120_000, num_steps=16, scheme="qe",
            antithetic=True)
        want = P.theta + (P.v0 - P.theta) * math.exp(-P.kappa * T)
        assert abs(ev - want) < 3e-3

    def test_f32_f64_parity_same_stream(self):
        """The framework's dtype contract: f32 production prices vs the
        f64 oracle on the IDENTICAL Threefry draws. Paths accumulate in
        storage dtype but means in f64; per-path f32 noise averages out
        below 1e-5 relative at 50k paths."""
        a, fa, _ = mc_heston_european_prices(
            P, T, STRIKES, num_paths=50_000, num_steps=32, scheme="qe")
        b, fb, _ = mc_heston_european_prices(
            P, T, STRIKES, num_paths=50_000, num_steps=32, scheme="qe",
            dtype=jnp.float64)
        np.testing.assert_allclose(a, b, rtol=2e-5)
        assert abs(fa - fb) / fb < 2e-5

    def test_antithetic_mirrors(self):
        """Antithetic halves must reuse the first half's draws mirrored:
        same seed, antithetic on/off share the first half-ensemble, so
        the prices agree to MC accuracy while the spread tightens."""
        a, _, _ = mc_heston_european_prices(
            P, T, [100.0], num_paths=40_000, num_steps=16, scheme="qe",
            antithetic=True, seed=7)
        b, _, _ = mc_heston_european_prices(
            P, T, [100.0], num_paths=40_000, num_steps=16, scheme="qe",
            antithetic=False, seed=7)
        assert abs(a[0] - b[0]) < 0.3
        with pytest.raises(ValueError, match="even"):
            mc_heston_european_prices(P, T, [100.0], num_paths=101,
                                      antithetic=True)

    def test_unknown_scheme(self):
        with pytest.raises(ValueError, match="scheme"):
            mc_heston_european_prices(P, T, [100.0], num_paths=1000,
                                      scheme="milstein")

    def test_deterministic_in_seed(self):
        a, _, _ = mc_heston_european_prices(P, T, STRIKES,
                                            num_paths=10_000, seed=5)
        b, _, _ = mc_heston_european_prices(P, T, STRIKES,
                                            num_paths=10_000, seed=5)
        np.testing.assert_array_equal(a, b)


class TestObjectAPI:
    def test_euler_scheme_agrees_with_fused_engine(self, cf_prices):
        """HestonModel + the shared EulerScheme (the finmath object-API
        shape) must price like the fused full-truncation engine — same
        dynamics, independent code paths and RNG streams."""
        num_paths, num_steps = 60_000, 64
        td = TimeDiscretization(initial=0.0, num_steps=num_steps,
                                step=T / num_steps)
        model = HestonModel(P)
        scheme = EulerScheme(model, BrownianMotion(td, 2, num_paths,
                                                   seed=99))
        s_t = scheme.get_process_value(num_steps, 0)
        df = math.exp(-P.risk_free_rate * T)
        k = 100.0
        price = s_t.sub(k).floor(0.0).get_average() * df
        assert abs(price - cf_prices[2]) < 0.25

    def test_variance_component_stays_meaningful(self):
        td = TimeDiscretization(initial=0.0, num_steps=32, step=T / 32)
        scheme = EulerScheme(HestonModel(P), BrownianMotion(td, 2, 20_000,
                                                            seed=3))
        v_t = scheme.get_process_value(32, 1)
        # full-truncation Euler can go slightly negative pathwise but the
        # mean must track the CIR mean
        want = P.theta + (P.v0 - P.theta) * math.exp(-P.kappa * T)
        assert abs(v_t.get_average() - want) < 4e-3

    def test_numeraire(self):
        model = HestonModel(P)
        assert model.numeraire(2.0).get_average() == pytest.approx(
            math.exp(P.risk_free_rate * 2.0))


class TestCalibration:
    def test_round_trip_recovers_params(self):
        maturities = [0.5, 1.0, 2.0]
        strikes = [STRIKES, STRIKES, STRIKES]
        targets = [heston_characteristic_prices(P, t, k)
                   for t, k in zip(maturities, strikes)]
        start = HestonParams(100.0, 0.03, v0=0.09, kappa=0.5, theta=0.09,
                             xi=0.8, rho=-0.2)
        res = calibrate_heston(100.0, 0.03, maturities, strikes, targets,
                               x0=start)
        assert res.rms_price_error < 1e-6
        q = res.params
        assert q.v0 == pytest.approx(P.v0, rel=1e-3)
        assert q.rho == pytest.approx(P.rho, rel=1e-2)
        assert q.theta == pytest.approx(P.theta, rel=1e-2)

    def test_misaligned_inputs(self):
        with pytest.raises(ValueError, match="align"):
            calibrate_heston(100.0, 0.03, [1.0], [STRIKES, STRIKES],
                             [STRIKES])
