"""QMC continuation calibration: polish-only from known basins on
sobol(+antithetic) realizations of the 81,920-path stoch-vol benchmark.

The full multistart on one plain-sobol realization reached rms19 0.2007%
in 55.9 s (results_qmc_81920.json) — stage1 + sweep dominate the wall,
yet on this workload they rediscover basins we already ship
(CURATED_BASINS + the QMC optimum). This experiment measures the
production continuation path: score the known basins, then run the same
two-stage full-path trust-region polish the multistart ends with, on
independent Owen scramblings of the sobol+antithetic estimator
(BENCHMARKS.md's recommended production estimator). Reports per-seed
achieved rms19 + polish wall — the honest spread of the achievable
optimum under the better-conditioned estimator.

Usage: python benchmarks/stochvol_qmc_polish.py [--paths 81920]
       [--seeds 3] [--antithetic/--plain]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the full-multistart optimum on the plain-sobol seed-0 realization
# (results_qmc_81920.json) — a QMC-located basin, used here as a start
QMC_OPT = np.asarray([
    0.21622999389217004, -0.00799350760968651, -0.12647697331516541,
    0.1308191521190843, -0.08915743870438382, 1.401374780385544,
    -1.4923475940894546, -0.7330125232238609,
])


def polish(fun, jac, start, max_nfev=250):
    from scipy.optimize import least_squares

    r1 = least_squares(fun, start, jac=jac, method="trf", x_scale="jac",
                       max_nfev=40)
    r2 = least_squares(fun, r1.x, jac=jac, method="trf", x_scale="jac",
                       max_nfev=max_nfev, ftol=1e-14, xtol=1e-14, gtol=1e-14)
    e1 = float(np.sqrt(np.mean(fun(r1.x) ** 2)))
    e2 = float(np.sqrt(np.mean(fun(r2.x) ** 2)))
    nfev = int(r1.nfev) + int(r2.nfev)
    return ((e1, r1.x, nfev) if e1 <= e2 else (e2, r2.x, nfev))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=81_920)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--plain", action="store_true",
                    help="plain sobol instead of sobol+antithetic")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from finmath_tpu.models.lmm.benchmark_calibration import (
        CURATED_BASINS, build_benchmark_calibration)

    anti = not args.plain
    mode = "sobol+antithetic" if anti else "sobol"
    out = {"paths": args.paths, "mode": mode, "per_seed": []}
    starts = [("qmc_opt", QMC_OPT), ("curated0", CURATED_BASINS[0])]

    for seed in range(args.seeds):
        t_build0 = time.perf_counter()
        s = build_benchmark_calibration(num_paths=args.paths,
                                        brownian="sobol", seed=seed,
                                        antithetic=anti)
        eng = s.engine

        def fun(x):
            r = np.asarray(eng.residuals(x), dtype=np.float64)
            return np.nan_to_num(r, nan=1e3, posinf=1e3, neginf=-1e3)

        def jac(x):
            J = np.asarray(eng.jacobian(x), dtype=np.float64)
            return np.nan_to_num(J, nan=0.0, posinf=0.0, neginf=0.0)

        def rms19(x):
            d = s.deviations(x)
            return float(np.sqrt(np.sum(d ** 2) / 19))

        # warm (compile excluded, like every other timed region here)
        fun(QMC_OPT)
        jac(QMC_OPT)
        build_s = time.perf_counter() - t_build0

        row = {"seed": seed, "build_and_compile_s": round(build_s, 2),
               "fixed_point": {}, "polish": {}}
        for name, x in starts:
            row["fixed_point"][name] = rms19(np.asarray(x))
        t0 = time.perf_counter()
        best = (np.inf, None, 0)
        for name, x in starts:
            e, xx, nfev = polish(fun, jac, np.asarray(x, dtype=np.float64))
            r19 = rms19(xx)
            row["polish"][name] = {"rms15_obj": e, "rms19": r19,
                                   "nfev": nfev}
            if r19 < best[0]:
                best = (r19, xx, nfev)
        row["polish_wall_s"] = round(time.perf_counter() - t0, 2)
        row["best_rms19"] = best[0]
        row["best_params"] = list(map(float, best[1]))
        out["per_seed"].append(row)
        print(f"[{mode} seed {seed}] fixed {row['fixed_point']} -> "
              f"best rms19 {best[0] * 100:.4f}% in {row['polish_wall_s']} s",
              flush=True)

    out["best_rms19_spread"] = [min(r["best_rms19"] for r in out["per_seed"]),
                                max(r["best_rms19"] for r in out["per_seed"])]
    path = args.out or f"benchmarks/results_qmc_polish_{args.paths}.json"
    Path(path).write_text(json.dumps(out, indent=1))
    print("saved ->", path, flush=True)


if __name__ == "__main__":
    main()
