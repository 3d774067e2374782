"""AOT program persistence (utils/aot.py + LMMValuationEngine
.export_programs/.load_programs): serialized StableHLO round-trips must
reproduce the jit path exactly, key on the engine config, and fall back
cleanly on any mismatch."""

import numpy as np
import pytest

import jax

from finmath_tpu.models.lmm.benchmark_calibration import (
    build_benchmark_calibration)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aot"))
    s = build_benchmark_calibration(num_paths=512, brownian="sobol", seed=0)
    n = s.export_aot(d)
    assert n == 8, n          # 4 programs x (main + sweep==main? no: 512 -> sweep is main)
    return d, s


class TestAOTRoundTrip:
    def test_export_load_matches_jit_path(self, exported):
        d, s0 = exported
        p0 = np.asarray(s0.covariance.initial_parameters)
        ref = {
            "residuals": np.asarray(s0.engine.residuals(p0)),
            "jacobian": np.asarray(s0.engine.jacobian(p0)),
            "values": np.asarray(s0.engine.values(p0)),
            "implied": np.asarray(s0.engine.implied_vols(p0)),
        }
        s1 = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                         seed=0)
        assert s1.load_aot(d) is True
        np.testing.assert_allclose(np.asarray(s1.engine.residuals(p0)),
                                   ref["residuals"], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s1.engine.jacobian(p0)),
                                   ref["jacobian"], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s1.engine.values(p0)),
                                   ref["values"], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s1.engine.implied_vols(p0)),
                                   ref["implied"], rtol=1e-12)

    def test_realization_swap_after_load(self, exported):
        from finmath_tpu.models.qmc import sobol_brownian_increments

        d, s0 = exported
        p0 = np.asarray(s0.covariance.initial_parameters)
        s1 = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                         seed=0)
        assert s1.load_aot(d)
        v0 = np.asarray(s1.engine.values(p0))
        s1.set_increments(np.asarray(sobol_brownian_increments(
            np.full(40, 0.5), s1.engine._n_rng_factors, 512, seed=3)))
        v1 = np.asarray(s1.engine.values(p0))
        assert not np.allclose(v0, v1)

    def test_mismatched_config_falls_back(self, exported):
        d, _ = exported
        other = build_benchmark_calibration(num_paths=1024,
                                            brownian="sobol", seed=0)
        assert other.engine.load_programs(d) is False

    def test_meshed_engine_refuses(self, exported):
        d, _ = exported
        devs = np.asarray(jax.devices())
        if devs.size < 2:
            pytest.skip("needs the virtual CPU mesh")
        from jax.sharding import Mesh

        mesh = Mesh(devs, ("paths",))
        s = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                        seed=0, mesh=mesh)
        assert s.engine.export_programs(d) == 0
        assert s.engine.load_programs(d) is False
