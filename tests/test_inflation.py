"""Jarrow-Yildirim inflation tests: moment-propagation consistency
with the single-economy Hull-White state functions, ZCIS curve-only
identities, YoY convexity vs the exact MC (the correction must match
the simulation, not the naive forward ratio), caplet/floorlet parity,
and correlation sign effects."""

import math

import numpy as np
import pytest

from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel
from finmath_tpu.models.inflation import (JarrowYildirimModel,
                                          JarrowYildirimSimulation)
from finmath_tpu.models.time_discretization import TimeDiscretization

T_GRID = np.arange(0.0, 21.0)
NOM = HullWhiteModel(DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID)),
                     0.1, 0.01)
REAL = HullWhiteModel(DiscountCurve(T_GRID, np.exp(-0.01 * T_GRID)),
                      0.2, 0.006)


def make_jy(rho_nr=0.3, rho_ni=0.1, rho_ri=-0.3, cpi_vol=0.012):
    return JarrowYildirimModel(NOM, REAL, 100.0, cpi_vol, rho_nr,
                               rho_ni, rho_ri)


class TestMoments:
    def test_propagation_matches_hull_white_state(self):
        # Var(Y_n(T)) and Var(x_n(T)) from the 5-state recursion must
        # equal the single-economy gaussian_state V and phi — the two
        # derivations are independent
        jy = make_jy()
        times = np.arange(0.0, 10.5, 0.5)
        mu, sig, _ = jy._moments(times)
        for j, t in enumerate(times):
            if t == 0.0:
                continue
            phi_n, _, v_n = NOM.gaussian_state(float(t))
            phi_r, _, v_r = REAL.gaussian_state(float(t))
            assert abs(sig[j][0, 0] - phi_n) < 1e-14
            assert abs(sig[j][1, 1] - v_n) < 1e-14
            assert abs(sig[j][2, 2] - phi_r) < 1e-14
            assert abs(sig[j][3, 3] - v_r) < 1e-14
        # nominal factors are mean-zero; the real ones carry the quanto
        # drift with the sign of -rho_ri
        assert np.allclose(mu[:, [0, 1, 4]], 0.0)
        assert mu[-1, 2] > 0.0 and mu[-1, 3] > 0.0      # rho_ri < 0

    def test_grid_invariance(self):
        # moments are exact per segment: refining the grid changes
        # nothing
        jy = make_jy()
        a = jy.yoy_forward(4.0, 5.0)
        times_fine = np.arange(0.0, 5.05, 0.1)
        j1, j2 = 40, 50
        d, a_int_n = jy._cpi_coeffs(times_fine)
        e = np.array([0.0, 1.0, 0.0, -1.0, 1.0])
        f = np.array([0.0, -1.0, 0.0, 0.0, 0.0])
        mean, var = jy._exp_affine(times_fine, -e, e + f, j1, j2)
        b = math.exp(d[j2] - d[j1] - a_int_n[j2] + mean
                     + 0.5 * var) / float(NOM.df(5.0))
        assert abs(a - b) < 1e-12


class TestZCIS:
    def test_par_and_value(self):
        jy = make_jy()
        k = jy.zcis_par_rate(5.0)
        assert abs(jy.zcis_value(5.0, k)) < 1e-14
        # curve-only identity: (1+K)^T = P_r / P_n
        assert abs((1 + k) ** 5.0
                   - float(REAL.df(5.0) / NOM.df(5.0))) < 1e-12
        # vol-independent
        assert make_jy(cpi_vol=0.05).zcis_par_rate(5.0) == pytest.approx(k)
        with pytest.raises(ValueError):
            jy.zcis_par_rate(-1.0)


class TestYoY:
    @pytest.fixture(scope="class")
    def sim(self):
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
        return JarrowYildirimSimulation(make_jy(), td,
                                        num_paths=200_000, seed=3)

    def test_forward_matches_mc_not_naive(self, sim):
        jy = sim.model
        for t1, t2 in ((4.0, 5.0), (9.0, 10.0)):
            an = jy.yoy_forward(t1, t2)
            mc, se = sim.mc_yoy_forward(t1, t2)
            naive = float(REAL.df(t2) / REAL.df(t1)
                          * NOM.df(t1) / NOM.df(t2))
            assert abs(an - mc) < 4 * se + 1e-6
            # the convexity correction is real: the analytic value
            # must be closer to the MC than the naive ratio is
            assert abs(an - mc) < abs(naive - mc)

    def test_caplet_matches_mc_and_parity(self, sim):
        jy = sim.model
        for k in (0.01, 0.02, 0.04):
            an = jy.yoy_caplet(4.0, 5.0, k)
            mc, se = sim.mc_yoy_caplet(4.0, 5.0, k)
            assert abs(an - mc) < 4 * se + 1e-6, (k, an, mc, se)
            fl_an = jy.yoy_caplet(4.0, 5.0, k, is_caplet=False)
            fl_mc, fl_se = sim.mc_yoy_caplet(4.0, 5.0, k,
                                             is_caplet=False)
            assert abs(fl_an - fl_mc) < 4 * fl_se + 1e-6
            # exact caplet/floorlet parity against the swaplet
            assert abs((an - fl_an)
                       - jy.yoy_swaplet_value(4.0, 5.0, k)) < 1e-14

    def test_swap_par_rate(self, sim):
        jy = sim.model
        pay = np.arange(1.0, 11.0)
        k = jy.yoy_swap_par_rate(pay)
        value = sum(jy.yoy_swaplet_value(a, b, k)
                    for a, b in zip(np.concatenate([[0.0], pay[:-1]]),
                                    pay))
        assert abs(value) < 1e-14
        with pytest.raises(ValueError):
            jy.yoy_swap_par_rate([-1.0, 1.0])

    def test_correlation_sign_on_convexity(self):
        # rho_ri couples the real rate (in I's drift with a minus) to
        # the CPI: more negative rho_ri raises E[I2/I1] under T2-fwd
        lo = make_jy(rho_ri=-0.6).yoy_forward(4.0, 5.0)
        hi = make_jy(rho_ri=0.6).yoy_forward(4.0, 5.0)
        assert lo != hi       # convexity responds to the correlation
        # and at zero vols the correction vanishes: fwd -> naive ratio
        tiny_nom = HullWhiteModel(NOM.curve, 0.1, 1e-8)
        tiny_real = HullWhiteModel(REAL.curve, 0.2, 1e-8)
        jy0 = JarrowYildirimModel(tiny_nom, tiny_real, 100.0, 0.012,
                                  0.3, 0.1, -0.3)
        naive = float(REAL.df(5.0) / REAL.df(4.0)
                      * NOM.df(4.0) / NOM.df(5.0))
        assert abs(jy0.yoy_forward(4.0, 5.0) - naive) < 1e-7

    def test_validation(self, sim):
        jy = sim.model
        with pytest.raises(ValueError):
            jy.yoy_forward(5.0, 4.0)
        with pytest.raises(ValueError):
            jy.yoy_caplet(4.0, 5.0, -1.5)
