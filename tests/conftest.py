"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(`finmath_tpu.parallel`) is exercised without TPU hardware. The env vars
must be set before JAX initializes its backends, hence at conftest import
time (pytest imports conftest before test modules). The shell may export
``JAX_PLATFORMS=axon`` (the real-TPU tunnel) and the axon plugin ignores a
late env override, so we also pin the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# smoke tier (round-3 VERDICT weak #5): `pytest -m smoke` is the default
# iteration loop — a <5-minute single-core subset covering the parity/RNG
# core, one LMM calibration + engine Jacobian, one test per model family,
# the mesh regression net, and one representative each of the exposure /
# XVA / Pallas / injected-increments heavyweights. The full suite stays
# the per-milestone gate.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SMOKE_MODULES = {
    "test_random_variable_parity.py", "test_brownian_motion.py",
    "test_black_scholes.py", "test_precise_math.py", "test_lazy.py",
    "test_aad.py", "test_aad_model_valuation.py", "test_heston.py",
    "test_heston_facade.py", "test_merton.py", "test_bates.py",
    "test_fourier_models.py", "test_hull_white.py", "test_credit.py",
    "test_portfolio_credit.py", "test_cross_currency.py",
    "test_multi_asset.py", "test_local_vol.py", "test_slv.py",
    "test_sabr.py", "test_bermudan.py", "test_hw_bermudan.py",
    "test_american.py", "test_qmc.py", "test_inflation.py",
    "test_commodity.py", "test_caps.py", "test_tarn.py",
    "test_importance_sampling.py", "test_structured_products.py",
    "test_measures_and_statespace.py", "test_regressions.py",
    "test_memory_and_aux.py", "test_risk.py", "test_observability.py",
    "test_products_and_utils.py", "test_mlmc.py",
    "test_equity_products.py", "test_hedging.py", "test_equity_mesh.py",
    "test_mesh_round3.py", "test_pde.py", "test_cube.py",
    "test_price_parity.py",
}

_SMOKE_TESTS = (
    "tests/test_lmm.py::TestLMMEngine::test_jacobian_matches_finite_difference",
    "tests/test_benchmark_model.py::TestBenchmarkModel::test_short_calibration_improves_fit",
    "tests/test_exposure.py::TestNettingSet::test_forward_value_martingale",
    "tests/test_xva_extensions.py::TestDynamicIM::test_im_nonnegative",
    "tests/test_parallel.py::TestShardedReductions::test_sharded_mean_matches_numpy",
    "tests/test_parallel.py::TestShardedLMM::test_sharded_matches_unsharded_within_mc_noise",
    "tests/test_injected_increments.py::TestCM3MersenneStream::test_native_and_numpy_bit_identical",
    "tests/test_injected_increments.py::TestFinmathIncrements::test_brownian_class",
    "tests/test_pallas_kernels.py::TestLMMPathKernelArithmeticCI::test_kernel_matches_numpy_on_injected_normals",
    "tests/test_hybrid.py::TestMartingale::",
    "tests/test_hybrid.py::TestHybridMesh::test_martingale_and_option_on_mesh",
)


# heavyweight outliers inside otherwise-fast smoke modules (their
# contracts are still enforced by the full suite)
_SMOKE_EXCLUDE = (
    "tests/test_price_parity.py::TestPriceParity1e6::"
    "test_lmm_stochvol_calibrated_point_f32_vs_f64",
    "tests/test_hedging.py::TestDeltaHedge::"
    "test_hedge_error_shrinks_like_sqrt_dt",
    "tests/test_pde.py::TestGreeksThroughSolver::"
    "test_vega_by_autodiff_matches_closed_form",
    "tests/test_cube.py::TestCMSSpreadOption::test_decreasing_in_correlation",
    "tests/test_fourier_models.py::TestVarianceGamma::"
    "test_calibration_recovers_surface",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if any(item.nodeid.startswith(p) for p in _SMOKE_EXCLUDE):
            continue
        if name in _SMOKE_MODULES or any(
                item.nodeid.startswith(p) or (item.nodeid + "::").startswith(p)
                for p in _SMOKE_TESTS):
            item.add_marker(pytest.mark.smoke)
