"""LIBOR Market Model swaption calibration — the north-star workload.

Run: python examples/03_lmm_calibration.py   (a few minutes on CPU;
seconds warm on TPU — sizes reduced here for a quick demo)

Bootstraps the EUR curve, builds the 144-product ATM swaption surface,
calibrates the piecewise-constant volatility with the two-stage
procedure (analytic warm start -> Monte-Carlo Levenberg-Marquardt with
exact jacfwd Jacobians), then checkpoints and re-prices deterministically.
"""

import os
import sys

# allow running straight from a source checkout (inserts the repo root;
# harmless when the package is pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from finmath_tpu.models.lmm.atm_calibration import build_atm_calibration
    from finmath_tpu.utils.serialization import load_checkpoint, save_checkpoint

    setup = build_atm_calibration(num_paths=4_000, num_factors=1,
                                  jacobian_paths=2_000)
    print(f"{len(setup.products)} calibration products on the 40Y grid")

    result = setup.calibrate(max_iterations=10, accuracy=1e-7,
                             warm_start="analytic")
    dev = setup.deviations(result.parameters)
    print(f"converged in {result.iterations} MC iterations; "
          f"mean deviation {dev.mean():.2e}, rms {np.sqrt((dev**2).mean()):.2e} "
          f"(reference contract: |mean| < 2e-4)")
    assert abs(dev.mean()) < 2e-4

    # checkpoint / resume: revaluation after the round-trip is bit-exact
    path = "/tmp/lmm_calibrated.npz"
    save_checkpoint(path, result.parameters,
                    metadata={"paths": 4_000, "rms": float(result.rms_error)})
    reloaded, meta = load_checkpoint(path)
    assert np.array_equal(
        setup.engine.implied_vols(result.parameters),
        setup.engine.implied_vols(reloaded),
    )
    print("checkpoint round-trip: revaluation bit-exact")

    # greeks of all 144 model quotes w.r.t. all 43 parameters: one
    # batched jacfwd pass on device
    J = setup.engine.jacobian(result.parameters)
    print(f"model-to-parameter Jacobian {J.shape} via jacfwd "
          f"(max |dvol/dparam| = {np.abs(J).max():.4f})")


if __name__ == "__main__":
    main()
