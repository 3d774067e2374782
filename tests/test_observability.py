"""Flagship-path observability (VERDICT round-2 item 9): LMResult.stages
and LMResult.history are populated on every calibrate_multistart exit
path, so a driver bench row is self-explaining."""

import numpy as np

from finmath_tpu.models.lmm.benchmark_calibration import (
    build_benchmark_calibration)


def test_gate_path_reports_stages_and_history():
    s = build_benchmark_calibration(num_paths=512)
    # absurdly loose target: the curated-basin gate fires after the three
    # full-path scoring evaluations, the cheapest complete exit path
    r = s.calibrate_multistart(target_rms19=10.0)
    assert r.converged
    assert r.stages.get("gate_fired") is True
    assert r.stages["sweep_mode"] == "sequential"
    assert r.stages["gate_s"] > 0
    assert r.stages["total_s"] >= r.stages["gate_s"]
    assert np.isfinite(r.stages["gate_best_rms"])
    # history carries the full-path rms of each scored candidate
    from finmath_tpu.models.lmm.benchmark_calibration import CURATED_BASINS
    assert len(r.history) == len(CURATED_BASINS)
    assert min(h for h in r.history if np.isfinite(h)) == r.stages["gate_best_rms"]
