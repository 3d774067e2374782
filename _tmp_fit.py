import numpy as np, time
from finmath_tpu.models.lmm.benchmark_calibration import build_benchmark_calibration
from finmath_tpu.models.calibration import LevenbergMarquardt

setup = build_benchmark_calibration(num_paths=81920, num_factors=5)
def run(p0, iters, label):
    lm = LevenbergMarquardt(setup.engine.residuals, setup.engine.jacobian,
                            lambda0=0.01, max_iterations=iters, accuracy=1e-10,
                            lower_bound=-np.inf)
    t0=time.time()
    res = lm.run(np.asarray(p0))
    dev = setup.deviations(res.parameters)
    print(f"{label}: {time.time()-t0:.0f}s iters={res.iterations} "
          f"rms={np.sqrt(np.mean(dev**2)):.4f} mean={np.mean(dev):.5f} "
          f"p={np.round(res.parameters,3)}", flush=True)
    return res

# continuation from the previous best
best = [0.676, 0.949, 0.31, -0.505, -0.002, 0.823, 0.399, 0.345]
r1 = run(best, 120, "continue")
# multi-start: stronger skew via more blend + higher vol-of-vol
r2 = run([0.3, 0.2, 0.3, 0.05, 0.1, 0.95, 0.8, -0.3], 120, "start2")
# multi-start: negative rho (equity-like skew direction)
r3 = run([0.2, 0.05, 0.1, 0.05, 0.1, 0.5, 0.5, -0.5], 120, "start3")
