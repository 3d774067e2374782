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


class TestCMSSpreadOption:
    """Gaussian-copula CMS spread options (CMSSpreadOptionPricer)."""

    @staticmethod
    def _legs(vol1=0.22, vol2=0.25, tenor2=2.0):
        # leg 1: the module-level 10Y underlying; leg 2: a 2Y underlying
        pay2 = [EXPIRY + (i + 1) * DELTA for i in range(int(tenor2 / DELTA))]
        a02 = swap_annuity(CURVE, pay2, [DELTA] * len(pay2))
        s02 = float((CURVE.get_discount_factor(EXPIRY)
                     - CURVE.get_discount_factor(pay2[-1])) / a02)
        map2 = LinearTSRAnnuityMapping.from_curve(
            CURVE, s02, pay2, payment_time=EXPIRY + DELTA,
            period_length=DELTA)
        smile1 = flat_smile(vol1)
        smile2 = SwaptionSmile(forward=s02, expiry=EXPIRY,
                               params=SABRParams(alpha=vol2, beta=1.0,
                                                 rho=0.0, nu=0.0))
        leg1 = CMSReplicationPricer(smile1, MAPPING, A0)
        leg2 = CMSReplicationPricer(smile2, map2, a02)
        return leg1, leg2

    def _pricer(self, rho, **kw):
        from finmath_tpu.models.cube import CMSSpreadOptionPricer
        leg1, leg2 = self._legs(**kw)
        df = float(CURVE.get_discount_factor(EXPIRY + DELTA))
        return CMSSpreadOptionPricer(leg1, leg2, rho, df)

    def test_marginals_reproduce_cms_rates(self):
        p = self._pricer(0.5)
        e1, e2 = p.forwards()
        assert abs(e1 - p.legs[0].cms_rate()) < 2e-5
        assert abs(e2 - p.legs[1].cms_rate()) < 2e-5

    def test_cap_floor_parity(self):
        p = self._pricer(0.3)
        k = 0.002
        cap = p.spread_option_value(k, is_cap=True)
        floor = p.spread_option_value(k, is_cap=False)
        e1, e2 = p.forwards()
        # quadrature-accuracy parity: the copula rotation moves leg 2's
        # effective nodes, so this holds to GH error, not machine eps
        assert abs((cap - floor) - p.df * (e1 - e2 - k)) < 5e-5

    def test_copula_matches_normal_approximation_mild_smile(self):
        # lognormal at these vol levels is near-normal over the bulk:
        # the copula and the Bachelier quote must agree to a few % of
        # the value for an ATM-forward spread strike
        p = self._pricer(0.6)
        e1, e2 = p.forwards()
        k = e1 - e2
        v_cop = p.spread_option_value(k)
        v_nrm = p.normal_approximation_value(k)
        assert abs(v_cop - v_nrm) < 0.05 * v_nrm

    def test_decreasing_in_correlation(self):
        k = 0.0
        vals = [self._pricer(r).spread_option_value(k)
                for r in (-0.5, 0.0, 0.5, 0.9)]
        assert all(a > b for a, b in zip(vals, vals[1:]))

    def test_perfect_correlation_same_leg_degenerates(self):
        # identical legs at rho ~ 1: the spread collapses to zero
        from finmath_tpu.models.cube import CMSSpreadOptionPricer
        leg1, _ = self._legs()
        df = float(CURVE.get_discount_factor(EXPIRY + DELTA))
        p = CMSSpreadOptionPricer(leg1, leg1, 0.9999, df)
        atm_scale = p.legs[0].caplet_value(p.legs[0].smile.forward)
        assert p.spread_option_value(0.0) < 0.02 * atm_scale

    def test_zero_vol_leg_degenerates_to_cms_caplet(self):
        # sigma2 -> 0: spread cap(K) = CMS caplet at strike K + F2,
        # both expressed under the Tp measure
        p = self._pricer(0.0, vol2=1e-4)
        e1, e2 = p.forwards()
        k = 0.003
        v = p.spread_option_value(k)
        # direct check against a 1-d quadrature on leg 1's marginal
        # (same implied distribution, no copula)
        u = 0.5 * (1.0 + np.array(np.polynomial.legendre.leggauss(400)[0]))
        w = 0.5 * np.array(np.polynomial.legendre.leggauss(400)[1])
        x1 = p._inverse_cdf(0, u)
        oned = p.df * float(np.sum(w * np.maximum(x1 - e2 - k, 0.0)))
        assert abs(v - oned) < 0.03 * oned + 1e-6

    def test_validation(self):
        from finmath_tpu.models.cube import CMSSpreadOptionPricer
        leg1, leg2 = self._legs()
        with pytest.raises(ValueError):
            CMSSpreadOptionPricer(leg1, leg2, 1.0, 0.8)
