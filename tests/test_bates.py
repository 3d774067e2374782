"""Bates SVJ tests (finmath_tpu/models/bates.py).

The CF is pinned by its two exact degenerations — lam -> 0 is the
(already validated) Heston CF, xi -> 0 with v0 == theta is the (already
validated) Merton series — and the fused MC kernel against the CF
across strikes on the same martingale diagnostic the other equity
engines use."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.bates import (
    BatesParams,
    MonteCarloBatesModel,
    bates_characteristic_prices,
    mc_bates_european_prices,
)
from finmath_tpu.models.heston import HestonParams, heston_characteristic_prices
from finmath_tpu.models.merton import MertonParams, merton_series_prices
from finmath_tpu.models.time_discretization import TimeDiscretization

KS = np.array([80.0, 90.0, 100.0, 110.0, 125.0])
P = BatesParams(100.0, 0.03, v0=0.04, kappa=1.5, theta=0.05, xi=0.6,
                rho=-0.7, jump_intensity=0.6, jump_size_mean=-0.12,
                jump_size_std=0.18)
T = 1.5


@pytest.fixture(scope="module")
def cf_prices():
    return bates_characteristic_prices(P, T, KS)


class TestCharacteristicFunction:
    def test_lam_zero_is_heston(self):
        p0 = BatesParams(100.0, 0.03, 0.04, 1.5, 0.05, 0.6, -0.7,
                         1e-14, -0.12, 0.18)
        h = heston_characteristic_prices(
            HestonParams(100.0, 0.03, 0.04, 1.5, 0.05, 0.6, -0.7), T, KS)
        np.testing.assert_allclose(
            bates_characteristic_prices(p0, T, KS), h, rtol=1e-9)

    def test_xi_zero_is_merton(self):
        # v0 == theta and xi -> 0: variance pinned at v0, so Bates is
        # Merton with sigma = sqrt(v0)
        # the vol-of-vol correction to the price is O(xi) at rho != 0;
        # xi = 1e-4 leaves ~5e-5 relative residual (measured) without
        # entering the CF's xi^2 cancellation regime
        p0 = BatesParams(100.0, 0.03, 0.04, 1.5, 0.04, 1e-4, -0.7,
                         0.6, -0.12, 0.18)
        m = merton_series_prices(
            MertonParams(100.0, 0.03, math.sqrt(0.04),
                         jump_intensity=0.6, jump_size_mean=-0.12,
                         jump_size_std=0.18), T, KS)
        np.testing.assert_allclose(
            bates_characteristic_prices(p0, T, KS), m, rtol=1.5e-4)

    def test_jumps_raise_otm_put_wing(self, cf_prices):
        # negative-mean jumps: OTM puts gain more (in relative terms)
        # than the heston-only prices
        h = heston_characteristic_prices(P.heston, T, KS)
        df = math.exp(-0.03 * T)
        put_b = cf_prices[0] - 100.0 + KS[0] * df
        put_h = h[0] - 100.0 + KS[0] * df
        assert put_b > put_h * 1.05

    def test_param_validation(self):
        with pytest.raises(ValueError):
            BatesParams(100.0, 0.03, -0.04, 1.5, 0.05, 0.6, -0.7,
                        0.6, -0.12, 0.18)
        with pytest.raises(ValueError):
            BatesParams(100.0, 0.03, 0.04, 1.5, 0.05, 0.6, -0.7,
                        -0.6, -0.12, 0.18)


class TestMonteCarlo:
    def test_mc_matches_cf(self, cf_prices):
        px, fwd, ev = mc_bates_european_prices(
            P, T, KS, num_paths=400_000, num_steps=96, antithetic=True)
        np.testing.assert_allclose(px, cf_prices, rtol=1.2e-2)
        assert abs(fwd - 100.0) < 0.15
        want = P.theta + (P.v0 - P.theta) * math.exp(-P.kappa * T)
        assert abs(ev - want) < 3e-3

    def test_f32_f64_parity_same_stream(self):
        a, fa, _ = mc_bates_european_prices(
            P, T, KS, num_paths=100_000, num_steps=32)
        b, fb, _ = mc_bates_european_prices(
            P, T, KS, num_paths=100_000, num_steps=32,
            dtype=jnp.float64)
        np.testing.assert_allclose(a, b, rtol=2e-5)
        assert abs(fa - fb) / fb < 2e-5

    def test_jump_tail_guard(self):
        hot = BatesParams(100.0, 0.03, 0.04, 1.5, 0.05, 0.6, -0.7,
                          200.0, -0.12, 0.18)
        with pytest.raises(ValueError, match="tail mass"):
            mc_bates_european_prices(hot, T, KS, num_paths=1000,
                                     num_steps=4)


class TestFacade:
    @pytest.fixture(scope="class")
    def mc(self):
        td = TimeDiscretization(initial=0.0, num_steps=30, step=0.05)
        return MonteCarloBatesModel(td, 200_000, P, seed=5)

    def test_martingale(self, mc):
        s = mc.get_asset_value(1.5)
        fwd = float(s.get_average()) * math.exp(-0.03 * 1.5)
        assert abs(fwd - 100.0) < 4 * float(
            s.get_standard_error()) * math.exp(-0.03 * 1.5) + 0.05

    def test_matches_fused_kernel_prices(self, mc, cf_prices):
        s = mc.get_asset_value(1.5).values
        df = math.exp(-0.03 * 1.5)
        pay = np.maximum(np.asarray(s, dtype=np.float64)[None, :]
                         - KS[:, None], 0.0)
        px = pay.mean(axis=1) * df
        np.testing.assert_allclose(px, cf_prices, rtol=2.5e-2)

    def test_product_zoo_runs_under_bates(self, mc):
        from finmath_tpu.models.equity_products import (
            AsianOption,
            DigitalOption,
        )
        dig = DigitalOption(1.0, 100.0).get_value(mc)
        assert 0.2 < dig < 0.8
        asian = AsianOption([0.25, 0.5, 0.75, 1.0], 100.0).get_value(mc)
        assert 0.0 < asian < 20.0

    def test_off_grid_time_raises(self, mc):
        with pytest.raises(ValueError, match="0.33"):
            mc.get_asset_value(0.33)
