import numpy as np, time
from finmath_tpu.models.lmm.benchmark_calibration import build_benchmark_calibration
from finmath_tpu.models.calibration import LevenbergMarquardt
setup = build_benchmark_calibration(num_paths=81920, num_factors=5)
lm = LevenbergMarquardt(setup.engine.residuals, setup.engine.jacobian,
                        lambda0=0.1, max_iterations=60, accuracy=1e-9, lower_bound=-np.inf)
t0=time.time()
res = lm.run(setup.covariance.initial_parameters)
dev = setup.deviations(res.parameters)
print(f"81920 paths: {time.time()-t0:.1f}s iters={res.iterations} "
      f"rms_dev={np.sqrt(np.mean(dev**2)):.4f} mean={np.mean(dev):.5f} params={np.round(res.parameters,3)}", flush=True)
