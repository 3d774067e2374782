"""Round-2 intensified search: refine the best basin found by
stochvol_multistart.py (exponent 0.5) and explore around it."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.optimize import least_squares

from finmath_tpu.models.lmm import benchmark_calibration as bc

BEST_R1 = np.asarray([0.30348388, 0.0594386, 0.0874078, 0.08928988,
                      0.11696195, -0.07899034, 1.10394829, -0.60141384])


def main(num_paths=81920, seed=314151):
    t0 = time.time()
    setup = bc.build_benchmark_calibration(num_paths=num_paths, seed=seed)
    eng = setup.engine

    def fun(x):
        r = np.asarray(eng.residuals(x))
        return np.where(np.isfinite(r), r, 1e3)

    def jac(x):
        J = np.asarray(eng.jacobian(x))
        return np.where(np.isfinite(J), J, 0.0)

    def rms(x):
        d = setup.deviations(x)
        return float(np.sqrt(np.mean(d ** 2))), float(np.sqrt(np.sum(d ** 2) / 19))

    rng = np.random.default_rng(123)
    starts = [BEST_R1]
    for scale in (0.05, 0.1, 0.2):
        for _ in range(4):
            starts.append(BEST_R1 * (1 + rng.normal(0, scale, 8)))
    # a few wild ones
    for _ in range(4):
        w = BEST_R1.copy()
        w[:5] *= rng.uniform(0.5, 2.0, 5)
        w[5] = rng.uniform(-0.3, 0.5)
        w[6] = rng.uniform(0.5, 1.6)
        w[7] = rng.uniform(-0.95, 0.0)
        starts.append(w)

    best = (np.inf, None, None)
    for k, s in enumerate(starts):
        meth = "lm" if k % 2 == 0 else "trf"
        kw = {} if meth == "lm" else {"x_scale": "jac"}
        try:
            r = least_squares(fun, s, jac=jac, method=meth, max_nfev=200,
                              ftol=1e-12, xtol=1e-12, gtol=1e-12, **kw)
        except Exception as ex:
            print(f"start {k}: failed {ex}")
            continue
        r15, r19 = rms(r.x)
        print(f"start {k} [{meth}]: nfev={r.nfev} rms15={r15*100:.4f}% "
              f"rms19={r19*100:.4f}% t={time.time()-t0:.0f}s", flush=True)
        if r15 < best[0]:
            best = (r15, r19, r.x)

    print(f"\nBEST rms15={best[0]*100:.4f}% rms19={best[1]*100:.4f}%")
    print("params:", repr(best[2]))
    dev = setup.deviations(best[2])
    for p, d in zip(eng.products, dev):
        print(f"  e={p.exercise_index:3d} K={p.strike:.4f} tgt={p.target:.3f} "
              f"dev={d*100:+.3f}%")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 81920)
