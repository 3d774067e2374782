"""AAD risk ladders: reverse-mode bucketed deltas w.r.t. the initial
forward curve through the full LMM simulation
(``LMMValuationEngine.forward_deltas`` / ``forward_delta_matrix``).

The reference's AAD story is finmath-lib's host-side tape over eagerly
dispatched device ops (RandomVariableDifferentiableAAD usage in its
tests); here the pathwise adjoint of the whole Euler sweep is one fused
XLA program. These tests pin the arithmetic (AD == finite differences of
the same function), the decomposition (per-product rows sum to the
portfolio ladder), and the mesh path (sharded == single-device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmath_tpu.models.lmm.benchmark_calibration import (
    build_benchmark_calibration,
)

TOL_FD = 1e-6


@pytest.fixture(scope="module")
def setup():
    return build_benchmark_calibration(num_paths=2_048, seed=7,
                                       dtype=jnp.float64)


class TestForwardDeltaLadder:
    def test_matches_finite_differences(self, setup):
        """AD gradient == central FD of the SAME differentiable core
        (f64 paths; the kink set of max(payoff, 0) has measure zero)."""
        eng = setup.engine
        p0 = np.asarray(setup.covariance.initial_parameters)
        _, g = eng.forward_deltas(p0)

        core = eng._wrap_delta(eng._build_forward_delta_core())
        fn = jax.jit(core)
        base = np.asarray(eng.model.initial_forwards, dtype=np.float64)
        w = np.ones(len(eng.products))

        def val(f0):
            return float(fn(jnp.asarray(p0), jnp.asarray(f0),
                            jnp.asarray(w)))

        h = 1e-6
        for i in [5, 10, 20]:
            e = np.zeros_like(base)
            e[i] = h
            fd = (val(base + e) - val(base - e)) / (2 * h)
            assert g[i] == pytest.approx(fd, rel=1e-6, abs=1e-9), i

    def test_matrix_rows_sum_to_portfolio(self, setup):
        eng = setup.engine
        p0 = np.asarray(setup.covariance.initial_parameters)
        _, g = eng.forward_deltas(p0)
        M = eng.forward_delta_matrix(p0)
        assert M.shape == (len(eng.products), eng.model.num_libors)
        np.testing.assert_allclose(M.sum(axis=0), g, rtol=1e-12, atol=1e-12)

    def test_weights_select_products(self, setup):
        eng = setup.engine
        p0 = np.asarray(setup.covariance.initial_parameters)
        M = eng.forward_delta_matrix(p0)
        w = np.zeros(len(eng.products))
        w[3] = 2.0
        v, g = eng.forward_deltas(p0, weights=w)
        np.testing.assert_allclose(g, 2.0 * M[3], rtol=1e-12, atol=1e-12)
        vals = eng.values(p0)
        assert v == pytest.approx(2.0 * vals[3], rel=1e-10)

    def test_values_unchanged_by_fwd0_plumbing(self, setup):
        """Guard: threading fwd0 through the sim must be a no-op when
        fwd0 equals the model's own initial forwards."""
        eng = setup.engine
        p0 = np.asarray(setup.covariance.initial_parameters)
        v_public = eng.values(p0)
        raw, _ = jax.jit(lambda p, f0: eng._simulate_and_value(
            p, None, fwd0=f0))(jnp.asarray(p0),
                               jnp.asarray(eng.model.initial_forwards,
                                           dtype=jnp.float64))
        np.testing.assert_allclose(np.asarray(raw), v_public,
                                   rtol=1e-12, atol=1e-15)

    def test_atm_engine_fused_mode(self):
        """The fused-scan ATM engine (numeraire adjustment on) carries a
        finite ladder that matches FD on a spot bucket."""
        from finmath_tpu.models.lmm.atm_calibration import (
            build_atm_calibration,
        )

        a = build_atm_calibration(num_paths=2_048, num_factors=1, seed=3,
                                  dtype=jnp.float64)
        eng = a.engine
        p0 = np.asarray(a.covariance.initial_parameters)
        v, g = eng.forward_deltas(p0)
        assert np.all(np.isfinite(g)) and np.any(g != 0.0)

        core = eng._wrap_delta(eng._build_forward_delta_core())
        fn = jax.jit(core)
        base = np.asarray(eng.model.initial_forwards, dtype=np.float64)
        w = np.ones(len(eng.products))
        h = 1e-6
        i = 12
        e = np.zeros_like(base)
        e[i] = h
        fd = (float(fn(jnp.asarray(p0), jnp.asarray(base + e),
                       jnp.asarray(w)))
              - float(fn(jnp.asarray(p0), jnp.asarray(base - e),
                         jnp.asarray(w)))) / (2 * h)
        assert g[i] == pytest.approx(fd, rel=1e-5, abs=1e-8)

    def test_mesh_matches_single_device(self):
        """Sharded ladder (8 virtual devices, psum in the adjoint) equals
        the single-device one on the same workload."""
        from finmath_tpu.parallel import make_path_mesh

        p_single = build_benchmark_calibration(num_paths=2_048, seed=7)
        p_mesh = build_benchmark_calibration(num_paths=2_048, seed=7,
                                             mesh=make_path_mesh(8),
                                             brownian="finmath_mersenne")
        # same realization on both sides: inject the identical increments
        p_single2 = build_benchmark_calibration(num_paths=2_048, seed=7,
                                                brownian="finmath_mersenne")
        p0 = np.asarray(p_single.covariance.initial_parameters)
        v1, g1 = p_single2.engine.forward_deltas(p0)
        v2, g2 = p_mesh.engine.forward_deltas(p0)
        assert v1 == pytest.approx(v2, rel=1e-6)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-8)
