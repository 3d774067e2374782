"""Multi-chip sharding of the remaining model families (round-4 VERDICT
missing #2): Hull-White simulation (and with it the TARN sweep and the
HW Bermudan least-squares regression), Schwartz-Smith commodities,
Jarrow-Yildirim inflation, and the market-risk VaR engine take ``mesh=``
and shard the Monte-Carlo path/scenario axis via XLA SPMD propagation
from a NamedSharding'd state template — on the IDENTICAL Threefry
stream, so meshed results must equal unsharded ones up to reduction
order / 1-ULP fusion differences (the round-4 credit/xccy/copula
pattern, tests/test_mesh_round3.py)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from finmath_tpu.models.commodity import (SchwartzSmithModel,
                                          SchwartzSmithSimulation)
from finmath_tpu.models.curves import DiscountCurve
from finmath_tpu.models.hull_white import HullWhiteModel, HullWhiteSimulation
from finmath_tpu.models.hw_bermudan import BermudanSwaption
from finmath_tpu.models.inflation import (JarrowYildirimModel,
                                          JarrowYildirimSimulation)
from finmath_tpu.models.risk import MarketRiskEngine, OptionBook
from finmath_tpu.models.tarn import TargetRedemptionNote
from finmath_tpu.models.time_discretization import TimeDiscretization

T_GRID = np.arange(0.0, 21.0)
DC = DiscountCurve(T_GRID, np.exp(-0.03 * T_GRID))

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices())
    if devs.size < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(devs, ("paths",))


class TestHullWhiteMesh:
    def _sim(self, mesh, paths=16_000):
        hw = HullWhiteModel(DC, mean_reversion=0.1, volatility=0.01)
        td = TimeDiscretization(initial=0.0, num_steps=20, step=0.5)
        return HullWhiteSimulation(hw, td, num_paths=paths, seed=11,
                                   antithetic=True, mesh=mesh)

    def test_meshed_matches_unsharded(self, mesh):
        plain = self._sim(None)
        shard = self._sim(mesh)
        # identical stream: state histories agree to 1-ULP fusion noise
        np.testing.assert_allclose(np.asarray(shard._xs),
                                   np.asarray(plain._xs),
                                   rtol=0, atol=2e-7)
        for t in (2.0, 5.0):
            a = plain.mc_bond_price(t)
            b = shard.mc_bond_price(t)
            assert abs(b - a) < 1e-9 + 1e-6 * abs(a)

    def test_tarn_on_meshed_sim(self, mesh):
        plain = self._sim(None)
        shard = self._sim(mesh)
        tarn = TargetRedemptionNote(
            fixing_times=np.arange(1, 9) * 1.0,
            payment_times=np.arange(1, 9) * 1.0 + 0.5,
            strike=0.06, target=0.06, multiplier=2.0)
        va, ea = tarn.get_value_and_error(plain)
        vb, eb = tarn.get_value_and_error(shard)
        assert abs(vb - va) < 1e-6 + 1e-5 * abs(va)
        assert abs(eb - ea) < 1e-6

    def test_bermudan_ls_on_meshed_sim(self, mesh):
        # the exercise-boundary regression's normal equations reduce over
        # the sharded path axis (the sharded-regression dryrun leg)
        plain = self._sim(None)
        shard = self._sim(mesh)
        berm = BermudanSwaption([1.0, 2.0, 3.0], 6.0, 0.03)
        va, _ = berm.get_value_and_error(plain)
        vb, _ = berm.get_value_and_error(shard)
        assert abs(vb - va) < 1e-6 + 1e-4 * abs(va)

    def test_indivisible_paths_rejected(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            self._sim(mesh, paths=16_002)


class TestCommodityMesh:
    def _sim(self, mesh, paths=16_000):
        m = SchwartzSmithModel(chi0=0.1, xi0=3.0, kappa=1.5,
                               sigma_chi=0.25, sigma_xi=0.15, rho=0.3,
                               mu_star=0.02, lambda_chi=0.05)
        td = TimeDiscretization(initial=0.0, num_steps=12, step=0.25)
        return SchwartzSmithSimulation(m, td, num_paths=paths, seed=7,
                                       antithetic=True, mesh=mesh)

    def test_meshed_matches_unsharded(self, mesh):
        plain = self._sim(None)
        shard = self._sim(mesh)
        fa, sa = plain.mc_futures_prices(2.0, [2.5, 3.0])
        fb, sb = shard.mc_futures_prices(2.0, [2.5, 3.0])
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=1e-5)
        oa, _ = plain.mc_option_on_future(1.0, 2.0, [20.0, 25.0])
        ob, _ = shard.mc_option_on_future(1.0, 2.0, [20.0, 25.0])
        np.testing.assert_allclose(np.asarray(ob), np.asarray(oa),
                                   rtol=1e-4, atol=1e-8)

    def test_indivisible_paths_rejected(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            self._sim(mesh, paths=16_002)


class TestInflationMesh:
    def _sim(self, mesh, paths=16_000):
        dc_r = DiscountCurve(T_GRID, np.exp(-0.01 * T_GRID))
        jy = JarrowYildirimModel(
            HullWhiteModel(DC, 0.1, 0.01),
            HullWhiteModel(dc_r, 0.05, 0.006),
            cpi_initial=100.0, cpi_vol=0.012, rho_nr=0.3, rho_ni=-0.1,
            rho_ri=0.2)
        td = TimeDiscretization(initial=0.0, num_steps=10, step=0.5)
        return jy, JarrowYildirimSimulation(jy, td, num_paths=paths,
                                            seed=3, antithetic=True,
                                            mesh=mesh)

    def test_meshed_matches_unsharded(self, mesh):
        jy, plain = self._sim(None)
        _, shard = self._sim(mesh)
        za = plain.mc_zcis_value(5.0, jy.zcis_par_rate(5.0))
        zb = shard.mc_zcis_value(5.0, jy.zcis_par_rate(5.0))
        assert abs(zb - za) < 1e-8
        fa, _ = plain.mc_yoy_forward(3.0, 4.0)
        fb, _ = shard.mc_yoy_forward(3.0, 4.0)
        assert abs(fb - fa) < 1e-6

    def test_meshed_tracks_analytic(self, mesh):
        jy, shard = self._sim(mesh)
        f_mc, se = shard.mc_yoy_forward(2.0, 3.0)
        f_an = jy.yoy_forward(2.0, 3.0)
        assert abs(f_mc - f_an) < 4 * se + 1e-6


class TestRiskMesh:
    def _engine(self, mesh):
        book = OptionBook(
            spots=[100.0, 50.0], rate=0.02,
            underlying_index=[0, 0, 1, 1],
            strikes=[100.0, 110.0, 50.0, 45.0],
            expiries=[0.5, 1.0, 0.25, 0.75],
            vols=[0.2, 0.22, 0.3, 0.28],
            notionals=[1.0, -0.5, 2.0, 1.0],
            is_call=[True, True, False, True])
        return MarketRiskEngine(book, mesh=mesh)

    COV = np.array([[0.04, 0.012], [0.012, 0.09]])

    def test_meshed_matches_unsharded(self, mesh):
        a = self._engine(None).parametric_mc(self.COV,
                                             num_scenarios=16_000,
                                             seed=42)
        b = self._engine(mesh).parametric_mc(self.COV,
                                             num_scenarios=16_000,
                                             seed=42)
        assert abs(b.var - a.var) < 1e-9 + 1e-6 * abs(a.var)
        assert abs(b.expected_shortfall - a.expected_shortfall) \
            < 1e-9 + 1e-6 * abs(a.expected_shortfall)
        np.testing.assert_allclose(b.component_es, a.component_es,
                                   rtol=1e-5, atol=1e-10)

    def test_indivisible_scenarios_rejected(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            self._engine(mesh).parametric_mc(self.COV,
                                             num_scenarios=16_001,
                                             antithetic=False)
