"""Round-2 experiment harness for the stoch-vol benchmark calibration fit.

Explores structural variants of the reconstructed finmath benchmark model
(LIBORMarketModelCalibrationTest.java) to close the RMS gap vs the
reference's published 0.198% (81,920 paths, README.md:240-257).

Usage: python benchmarks/stochvol_experiment.py [paths] [exponent] [maxiter]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EXP_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import time  # noqa: E402

import numpy as np  # noqa: E402

from finmath_tpu.models.calibration import LevenbergMarquardt  # noqa: E402
from finmath_tpu.models.lmm import benchmark_calibration as bc  # noqa: E402


def run(num_paths=8192, exponent=1.0, max_iterations=60, seed=314151,
        no_early_stop=True, verbose=True):
    t0 = time.time()
    setup = bc.build_benchmark_calibration(num_paths=num_paths, seed=seed)
    setup.covariance.scaling_exponent = exponent

    lm = LevenbergMarquardt(
        setup.engine.residuals, setup.engine.jacobian,
        lambda0=0.1, max_iterations=max_iterations, accuracy=1e-9,
        lower_bound=-np.inf,
    )
    res = lm.run(setup.covariance.initial_parameters)
    dev = setup.deviations(res.parameters)
    vols = setup.engine.implied_vols(res.parameters)
    tgt = setup.engine.targets
    n_ref = 19  # reference divides by len(calibrationProducts) incl. 4 skipped
    rms15 = float(np.sqrt(np.mean(dev ** 2)))
    rms19 = float(np.sqrt(np.sum(dev ** 2) / n_ref))
    print(f"paths={num_paths} exp={exponent} iters={res.iterations} "
          f"rms15={rms15*100:.4f}% rms19={rms19*100:.4f}% "
          f"mean={np.mean(dev)*100:.4f}% t={time.time()-t0:.0f}s")
    print("  params:", np.round(res.parameters, 4))
    print("  history:", ["%.5f" % h for h in res.history])
    if verbose:
        for p, v, t, d in zip(setup.engine.products, vols, tgt, dev):
            print(f"  e={p.exercise_index:3d} K={p.strike:.4f} "
                  f"model={v:.4f} target={t:.4f} dev={d*100:+.3f}%")
    return res, setup


if __name__ == "__main__":
    paths = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    exponent = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    run(paths, exponent, maxiter)
