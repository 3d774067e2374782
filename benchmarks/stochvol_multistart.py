"""Multi-start + staged search for the benchmark calibration global optimum.

Stage 1: fit vol term structure params (a,b,c,d,e) to the 6 ATM quotes with
blend/nu/rho frozen at their initial values.
Stage 2: full 8-param fits from several starts (stage-1 result + jittered
variants), keep the best.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EXP_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from scipy.optimize import least_squares  # noqa: E402

from finmath_tpu.models.lmm import benchmark_calibration as bc  # noqa: E402


def main(num_paths=81920, seed=314151, exponent=1.0):
    t0 = time.time()
    setup = bc.build_benchmark_calibration(num_paths=num_paths, seed=seed)
    setup.covariance.scaling_exponent = exponent
    print(f"scaling_exponent={exponent}")
    eng = setup.engine
    x0 = np.asarray(setup.covariance.initial_parameters)
    atm_mask = np.asarray([p.strike_is_atm if hasattr(p, "strike_is_atm")
                           else False for p in eng.products])
    # ATM products: the 6 single ATM quotes (by construction they are the
    # ones whose (exercise, strike) came from the ATM list; smile quotes all
    # have exercise_index == 10 and 9 strikes). Identify by target match.
    atm_ids = [i for i, p in enumerate(eng.products)
               if not (p.exercise_index == 10 and p.target in bc.SMILE_VOLS)]

    def fun(x):
        r = np.asarray(eng.residuals(x))
        return np.where(np.isfinite(r), r, 1e3)

    def jac(x):
        J = np.asarray(eng.jacobian(x))
        return np.where(np.isfinite(J), J, 0.0)

    def rms(x):
        d = setup.deviations(x)
        return float(np.sqrt(np.mean(d ** 2))), float(np.sqrt(np.sum(d ** 2) / 19))

    # ---- stage 1: 5-param fit to ATM quotes only --------------------------
    frozen = x0[5:].copy()

    def fun5(x5):
        r = fun(np.concatenate([x5, frozen]))
        return r[atm_ids]

    def jac5(x5):
        J = jac(np.concatenate([x5, frozen]))
        return J[np.asarray(atm_ids)][:, :5]

    r5 = least_squares(fun5, x0[:5], jac=jac5, method="lm", max_nfev=60)
    x_stage1 = np.concatenate([r5.x, frozen])
    print(f"stage1 atm-only rms={np.sqrt(np.mean(r5.fun**2))*100:.3f}% "
          f"params={np.round(r5.x,4)} t={time.time()-t0:.0f}s", flush=True)

    # ---- stage 2: full fits from several starts ---------------------------
    rng = np.random.default_rng(7)
    starts = [x_stage1, x0]
    for _ in range(4):
        jitter = x_stage1.copy()
        jitter[:5] *= rng.uniform(0.8, 1.25, 5)
        jitter[5] = rng.uniform(0.0, 0.6)      # blend
        jitter[6] = rng.uniform(0.1, 0.5)      # nu
        jitter[7] = rng.uniform(-0.9, 0.3)     # rho
        starts.append(jitter)

    best = (np.inf, None, None)
    for k, s in enumerate(starts):
        r = least_squares(fun, s, jac=jac, method="lm", max_nfev=150)
        r15, r19 = rms(r.x)
        print(f"start {k}: nfev={r.nfev} rms15={r15*100:.4f}% "
              f"rms19={r19*100:.4f}% x={np.round(r.x,4)} "
              f"t={time.time()-t0:.0f}s", flush=True)
        if r15 < best[0]:
            best = (r15, r19, r.x)

    print(f"\nBEST rms15={best[0]*100:.4f}% rms19={best[1]*100:.4f}%")
    print("params:", repr(best[2]))
    dev = setup.deviations(best[2])
    for p, d in zip(eng.products, dev):
        print(f"  e={p.exercise_index:3d} K={p.strike:.4f} tgt={p.target:.3f} "
              f"dev={d*100:+.3f}%")


if __name__ == "__main__":
    paths = int(sys.argv[1]) if len(sys.argv) > 1 else 81920
    exp = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    main(paths, exponent=exp)
