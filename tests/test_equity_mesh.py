"""Multi-chip sharding of the equity facades (mesh= option): the path
axis is NamedSharding-partitioned at the Euler scan, XLA's SPMD
propagation partitions every downstream product kernel, and values
must agree with the unsharded facade on the identical Brownian stream
(reduction-order differences only)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from finmath_tpu.models.black_scholes import (
    BlackScholesModel,
    EuropeanOption,
    MonteCarloBlackScholesModel,
)
from finmath_tpu.models.equity_products import (
    AsianOption,
    BarrierOption,
    LookbackOption,
)
from finmath_tpu.models.heston import HestonParams, MonteCarloHestonModel
from finmath_tpu.models.multi_asset import (
    MonteCarloMultiAssetBlackScholesModel,
    MultiAssetBlackScholesModel,
    RainbowOption,
)
from finmath_tpu.models.time_discretization import TimeDiscretization

S0, R, SIG, T = 100.0, 0.05, 0.3, 1.0
N_PATHS = 64_000          # divisible by 8 devices


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices())
    if devs.size < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(devs, ("paths",))


def td(n):
    return TimeDiscretization(initial=0.0, num_steps=n, step=T / n)


class TestShardedFacades:
    def test_bs_products_match_unsharded(self, mesh):
        plain = MonteCarloBlackScholesModel(
            td(50), N_PATHS, BlackScholesModel(S0, R, SIG), seed=5)
        shard = MonteCarloBlackScholesModel(
            td(50), N_PATHS, BlackScholesModel(S0, R, SIG), seed=5,
            mesh=mesh)
        for prod in (EuropeanOption(T, 105.0),
                     AsianOption([0.2, 0.6, T], 100.0),
                     BarrierOption(T, 100.0, 130.0, "up-out"),
                     LookbackOption(T, "floating-call")):
            a = prod.get_value(plain)
            b = prod.get_value(shard)
            assert abs(a - b) < 1e-9 * max(abs(a), 1.0), type(prod)

    def test_states_actually_sharded(self, mesh):
        shard = MonteCarloBlackScholesModel(
            td(10), N_PATHS, BlackScholesModel(S0, R, SIG), seed=5,
            mesh=mesh)
        states = shard.process._lazy_states()
        # the path (last) axis is partitioned over the mesh
        assert len(states.sharding.device_set) == mesh.devices.size
        shard_shape = states.sharding.shard_shape(states.shape)
        assert shard_shape[-1] == N_PATHS // mesh.devices.size

    def test_heston_facade_sharded(self, mesh):
        p = HestonParams(S0, R, v0=0.04, kappa=1.5, theta=0.05, xi=0.4,
                         rho=-0.6)
        plain = MonteCarloHestonModel(td(20), N_PATHS, p, seed=7)
        shard = MonteCarloHestonModel(td(20), N_PATHS, p, seed=7,
                                      mesh=mesh)
        a = EuropeanOption(T, 100.0).get_value(plain)
        b = EuropeanOption(T, 100.0).get_value(shard)
        assert abs(a - b) < 1e-9 * a

    def test_multi_asset_rainbow_sharded(self, mesh):
        m = MultiAssetBlackScholesModel(
            [100.0, 95.0], R, [0.25, 0.35], [[1.0, 0.4], [0.4, 1.0]])
        plain = MonteCarloMultiAssetBlackScholesModel(
            td(10), N_PATHS, m, seed=11)
        shard = MonteCarloMultiAssetBlackScholesModel(
            td(10), N_PATHS, m, seed=11, mesh=mesh)
        prod = RainbowOption(T, 100.0, "call-on-min")
        a = prod.get_value(plain)
        b = prod.get_value(shard)
        assert abs(a - b) < 1e-9 * a

    def test_indivisible_paths_raise(self, mesh):
        bad = MonteCarloBlackScholesModel(
            td(10), N_PATHS + 1, BlackScholesModel(S0, R, SIG), seed=5,
            mesh=mesh)
        with pytest.raises(ValueError):
            bad.get_asset_value(T)
