"""Cap/floor products, checkpointing, profiling helpers."""

import math
import os

import numpy as np
import pytest

from finmath_tpu.models.analytic import bachelier_formula
from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
from finmath_tpu.models.lmm.products import CapFloor
from finmath_tpu.utils.serialization import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def setup():
    return build_atm_calibration(num_paths=20_000, num_factors=1)


class TestCapFloor:
    def test_caplet_value_vs_bachelier(self, setup):
        """Normal-dynamics model: a single caplet must price close to the
        Bachelier formula with the model's (flat) volatility."""
        model = setup.model
        p0 = setup.covariance.initial_parameters
        e = 4  # fixing at 2Y
        fwd = float(model.forward_curve.get_forward(model.tenor_times[e]))
        strike = fwd  # ATM
        cap = CapFloor(model, e, e + 1, strike, num_paths=20_000)
        mc = cap.get_value(p0)
        t_e = model.tenor_times[e]
        df_pay = float(model.discount_curve.get_discount_factor(model.tenor_times[e + 1]))
        analytic = bachelier_formula(fwd, strike, 0.005, t_e,
                                     payoff_unit=0.5 * df_pay)
        assert mc == pytest.approx(analytic, rel=0.08)

    def test_cap_floor_parity(self, setup):
        """floor = cap - swap must hold by construction; check the floor is
        sane: positive, and larger for higher strikes."""
        model = setup.model
        p0 = setup.covariance.initial_parameters
        fwd = float(model.forward_curve.get_forward(2.0))
        lo = CapFloor(model, 4, 10, fwd - 0.002, is_cap=False, num_paths=20_000)
        hi = CapFloor(model, 4, 10, fwd + 0.002, is_cap=False, num_paths=20_000)
        v_lo, v_hi = lo.get_value(p0), hi.get_value(p0)
        assert v_hi > v_lo
        assert v_hi > 0

    def test_invalid_range_rejected(self, setup):
        with pytest.raises(ValueError):
            CapFloor(setup.model, 5, 5, 0.01)


class TestCheckpointing:
    def test_roundtrip_exact_revaluation(self, setup, tmp_path):
        """Maps the reference's serialization determinism contract
        (revaluation identical to 1e-12 after round-trip, ATM test :440) —
        ours is bit-exact."""
        params = setup.covariance.initial_parameters * 1.07
        r_before = setup.engine.residuals(params)
        path = str(tmp_path / "model_ckpt")
        save_checkpoint(path, params, {"workload": "atm", "paths": 20000})
        restored, meta = load_checkpoint(path)
        assert meta["workload"] == "atm"
        np.testing.assert_array_equal(restored, params)
        r_after = setup.engine.residuals(restored)
        np.testing.assert_array_equal(r_before, r_after)


class TestProfiling:
    def test_trace_annotation_runs(self, caplog):
        import logging

        from finmath_tpu.utils.profiling import trace

        with caplog.at_level(logging.INFO, logger="finmath_tpu"):
            with trace("unit-test-region"):
                pass
        assert any("unit-test-region" in r.message for r in caplog.records)
