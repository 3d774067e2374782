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

    def test_corrupted_artifact_falls_back(self, exported, tmp_path):
        """A truncated/garbage artifact (e.g. a foreign jax version whose
        serialization we can't read) must miss cleanly, never raise."""
        import glob
        import os
        import shutil

        d, s0 = exported
        d2 = str(tmp_path / "corrupt")
        shutil.copytree(d, d2)
        paths = glob.glob(os.path.join(d2, "*.bin"))
        assert paths
        for p in paths:
            with open(p, "r+b") as fh:
                data = fh.read()
                fh.seek(0)
                fh.write(b"\x00garbage\xff" + data[9:])
        s1 = build_benchmark_calibration(num_paths=512, brownian="sobol",
                                         seed=0)
        assert s1.load_aot(d2) is False
        # and the jit path still works after the failed load
        p0 = np.asarray(s0.covariance.initial_parameters)
        np.testing.assert_allclose(np.asarray(s1.engine.values(p0)),
                                   np.asarray(s0.engine.values(p0)),
                                   rtol=1e-12)

    def test_key_includes_jax_version(self, monkeypatch):
        """A jax/jaxlib upgrade must change every artifact key (miss
        cleanly) instead of relying on deserialize failing."""
        import jax as _jax

        from finmath_tpu.utils import aot

        k0 = aot._key("cfg")
        monkeypatch.setattr(_jax, "__version__", "999.0.0")
        assert aot._key("cfg") != k0

    def test_xla_cache_scope_is_backend_scoped(self, tmp_path):
        """The persistent XLA cache dir embeds the backend (and host
        feature digest on CPU) so a CPU AOT entry compiled on another
        machine is never loaded (cpu_aot_loader SIGILL hazard)."""
        from finmath_tpu.utils import config as cfg

        scope = cfg.cache_scope()
        assert scope.startswith("cpu-"), scope       # conftest pins cpu
        assert len(scope.split("-", 1)[1]) == 12     # feature digest
        import jax as _jax

        old = _jax.config.jax_compilation_cache_dir
        try:
            d = cfg.enable_compilation_cache(str(tmp_path / "xc"))
            assert d is not None and d.endswith(scope)
            assert _jax.config.jax_compilation_cache_dir == d
        finally:
            _jax.config.update("jax_compilation_cache_dir", old)

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
