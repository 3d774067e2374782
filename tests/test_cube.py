"""Swaption cube + CMS replication tests (finmath_tpu/models/cube.py):
linear-TSR mapping consistency, quadrature vs the exact flat-lognormal
convexity adjustment, caplet-floorlet-swaplet parity, an MC
cross-check on true SABR dynamics, and cube interpolation."""

import math

import numpy as np
import pytest

from finmath_tpu.models.cube import (
    CMSReplicationPricer,
    LinearTSRAnnuityMapping,
    SwaptionCube,
    SwaptionSmile,
    flat_lognormal_convexity_adjustment,
)
from finmath_tpu.models.curves import DiscountCurve, swap_annuity
from finmath_tpu.models.sabr import (
    SABRParams,
    sabr_lognormal_implied_volatility,
)

TS = np.arange(0.5, 30.1, 0.5)
CURVE = DiscountCurve(list(TS), list(np.exp(-0.025 * TS)))
EXPIRY, TENOR, DELTA = 5.0, 10.0, 0.5
PAY_TIMES = [EXPIRY + (i + 1) * DELTA for i in range(int(TENOR / DELTA))]
A0 = swap_annuity(CURVE, PAY_TIMES, [DELTA] * len(PAY_TIMES))
S0 = float((CURVE.get_discount_factor(EXPIRY)
            - CURVE.get_discount_factor(PAY_TIMES[-1])) / A0)
MAPPING = LinearTSRAnnuityMapping.from_curve(
    CURVE, S0, PAY_TIMES, payment_time=EXPIRY + DELTA,
    period_length=DELTA)


def flat_smile(vol):
    return SwaptionSmile(forward=S0, expiry=EXPIRY,
                         params=SABRParams(alpha=vol, beta=1.0, rho=0.0,
                                           nu=0.0))


class TestAnnuityMapping:
    def test_martingale_consistency(self):
        # E^A[alpha(S_T)] = alpha(S0) must equal P(0,Tp)/A(0)
        p0p = float(CURVE.get_discount_factor(EXPIRY + DELTA))
        assert abs(MAPPING(S0) - p0p / A0) < 1e-14

    def test_normalization(self):
        # b = 1/sum(delta_i): the annuity's own payments normalize
        assert abs(MAPPING.b - 1.0 / (DELTA * len(PAY_TIMES))) < 1e-14

    def test_earlier_payment_larger_alpha(self):
        m_early = LinearTSRAnnuityMapping.from_curve(
            CURVE, S0, PAY_TIMES, payment_time=EXPIRY + DELTA,
            period_length=DELTA)
        m_late = LinearTSRAnnuityMapping.from_curve(
            CURVE, S0, PAY_TIMES, payment_time=PAY_TIMES[-1],
            period_length=DELTA)
        assert m_early(S0) > m_late(S0)


class TestReplicationQuadrature:
    def test_flat_lognormal_exact(self):
        for vol in (0.1, 0.25, 0.4):
            pr = CMSReplicationPricer(flat_smile(vol), MAPPING, A0)
            exact = flat_lognormal_convexity_adjustment(S0, vol, EXPIRY,
                                                        MAPPING)
            # 8-stddev strike-grid truncation leaves ~1e-9 at 40% vol
            assert abs(pr.convexity_adjustment() - exact) < 1e-8

    def test_second_moment_flat_lognormal(self):
        vol = 0.25
        pr = CMSReplicationPricer(flat_smile(vol), MAPPING, A0)
        exact = S0 * S0 * math.exp(vol * vol * EXPIRY)
        assert abs(pr.second_moment() - exact) < 1e-10

    def test_zero_vol_no_adjustment(self):
        pr = CMSReplicationPricer(flat_smile(1e-8), MAPPING, A0)
        assert abs(pr.convexity_adjustment()) < 1e-10

    def test_caplet_floorlet_swaplet_parity(self):
        p = SABRParams(alpha=0.25 * S0 ** 0.3, beta=0.7, rho=-0.25,
                       nu=0.25)
        pr = CMSReplicationPricer(
            SwaptionSmile(forward=S0, expiry=EXPIRY, params=p),
            MAPPING, A0)
        for k in (0.8 * S0, S0, 1.3 * S0):
            assert abs(pr.caplet_value(k) - pr.floorlet_value(k)
                       - pr.swaplet_value(k)) < 1e-11

    def test_positive_adjustment_for_early_payment(self):
        # payment right after expiry: alpha increasing in S -> CMS
        # rate above the forward
        pr = CMSReplicationPricer(flat_smile(0.25), MAPPING, A0)
        assert pr.convexity_adjustment() > 0.0

    def test_mc_cross_check_on_sabr_dynamics(self):
        # replicate off the Hagan smile, simulate the TRUE dynamics:
        # agreement within the expansion's accuracy at 25%-equivalent
        # vol
        import jax
        import jax.numpy as jnp

        from finmath_tpu.models.sabr import _sabr_terminal
        p = SABRParams(alpha=0.25 * S0 ** 0.3, beta=0.7, rho=-0.25,
                       nu=0.25)
        pr = CMSReplicationPricer(
            SwaptionSmile(forward=S0, expiry=EXPIRY, params=p),
            MAPPING, A0)
        x = np.asarray(_sabr_terminal(
            jax.random.PRNGKey(3), 400_000, 64, jnp.float32(S0),
            jnp.float32(p.alpha), jnp.float32(p.beta),
            jnp.float32(p.rho), jnp.float32(p.nu),
            jnp.float32(EXPIRY / 64), True), dtype=np.float64)
        w = MAPPING(x)
        mc_cap = A0 * np.mean(np.maximum(x - S0, 0.0) * w)
        assert abs(mc_cap - pr.caplet_value(S0)) < 0.03 * mc_cap
        mc_rate = np.mean(x * w) / np.mean(w)
        assert abs(mc_rate - pr.cms_rate()) < 0.1 * abs(
            pr.convexity_adjustment())


class TestSwaptionCube:
    def build(self):
        cube = SwaptionCube()
        for e in (2.0, 5.0):
            for t in (5.0, 10.0):
                p = SABRParams(alpha=0.2 * (1 + 0.1 * e / 5) * S0 ** 0.3,
                               beta=0.7, rho=-0.2, nu=0.3)
                cube.add_smile(e, t, SwaptionSmile(
                    forward=S0 * (1 + 0.05 * t / 10), expiry=e,
                    params=p))
        return cube

    def test_exact_on_cells(self):
        cube = self.build()
        sm = cube.get_smile(5.0, 10.0)
        k = S0
        assert abs(cube.get_volatility(5.0, 10.0, k)
                   - sm.volatility(k)) < 1e-14

    def test_interpolation_bounded_by_neighbors(self):
        cube = self.build()
        k = S0
        vols = [cube.get_volatility(e, t, k)
                for e in (2.0, 5.0) for t in (5.0, 10.0)]
        v = cube.get_volatility(3.5, 7.5, k)
        assert min(vols) - 1e-12 <= v <= max(vols) + 1e-12

    def test_extrapolation_clamps_to_edge(self):
        cube = self.build()
        k = S0
        assert abs(cube.get_volatility(1.0, 5.0, k)
                   - cube.get_volatility(2.0, 5.0, k)) < 1e-14

    def test_calibrate_cell_round_trip(self):
        cube = SwaptionCube()
        p = SABRParams(alpha=0.08, beta=0.5, rho=-0.3, nu=0.4)
        ks = S0 * np.array([0.6, 0.8, 1.0, 1.25, 1.6])
        vols = [sabr_lognormal_implied_volatility(p, S0, k, EXPIRY)
                for k in ks]
        smile = cube.calibrate_cell(EXPIRY, TENOR, S0, ks, vols,
                                    beta=0.5)
        assert abs(smile.params.alpha - 0.08) < 1e-5
        assert abs(smile.params.nu - 0.4) < 1e-3

    def test_missing_cell_raises(self):
        cube = self.build()
        with pytest.raises(KeyError):
            cube.get_smile(7.0, 10.0)
        with pytest.raises(ValueError):
            SwaptionCube().get_volatility(5.0, 10.0, S0)

    def test_put_call_parity_on_smile(self):
        sm = self.build().get_smile(5.0, 10.0)
        k = 1.2 * S0
        assert abs(sm.put(k) - (sm.call(k) - (sm.forward - k))) < 1e-15
