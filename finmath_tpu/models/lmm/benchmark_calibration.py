"""The reference's published LMM benchmark workload, packaged.

Mirrors /root/reference/.../LIBORMarketModelCalibrationTest.java — the test
behind the README's headline rows (CPU 364.42 s / GPU 49.46 s at 81,920
paths, README.md:240-257):

* forward curve from 100 semiannual forwards to 50Y (:195-215), discount
  curve implied from it (:216),
* 20Y x dt=0.5 tenor/simulation grid (:248-259),
* calibration products quoted as lognormal implied vols
  (SwaptionSimple VOLATILITYLOGNORMAL, :148): a 9-point smile at 5Y
  expiry / 10Y tenor plus 10 ATM swaptions at expiries 2..30Y (:227-245);
  products whose payments leave the 20Y grid are skipped like the
  reference's try/catch valuation loop does,
* covariance: 5-param exponential form (5 factors), blended local vol
  (b=0.2, calibrateable), lognormal stochastic-vol scaling
  (nu=0.15, rho=0.20, calibrateable) — 8 calibration parameters total
  (:269-275),
* NORMAL state space, SPOT measure, no discount curve given to the model
  (-> no numeraire adjustment), Levenberg-Marquardt lambda=0.1,
  accuracy 1e-6 (:297-306), final assert |mean deviation| < 1e-2 (:358).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..calibration import LevenbergMarquardt, LMResult
from ..curves import (DiscountCurveFromForwardCurve, ForwardCurveFromForwards,
                      par_swap_rate)
from ..time_discretization import TimeDiscretization
from .covariance import (BlendedLocalVolatilityModel,
                         LIBORCovarianceModelExponentialForm5Param,
                         LIBORCovarianceModelStochasticVolatility)
from .model import LIBORMarketModelTPU, LMMValuationEngine, SwaptionProduct

# benchmark test market data (:195-215)
FIXING_TIMES = np.arange(0.0, 50.5, 0.5)
FORWARD_RATES = np.asarray([
    0.61, 0.61, 0.67, 0.73, 0.80, 0.92, 1.11, 1.36, 1.60, 1.82, 2.02, 2.17,
    2.27, 2.36, 2.46, 2.52, 2.54, 2.57, 2.68, 2.82, 2.92, 2.98, 3.00, 2.99,
    2.95, 2.89, 2.82, 2.74, 2.66, 2.59, 2.52, 2.47, 2.42, 2.38, 2.35, 2.33,
    2.31, 2.30, 2.29, 2.28, 2.27, 2.27, 2.26, 2.26, 2.26, 2.26, 2.26, 2.26,
    2.27, 2.28, 2.28, 2.30, 2.31, 2.32, 2.34, 2.35, 2.37, 2.39, 2.42, 2.44,
    2.47, 2.50, 2.52, 2.56, 2.59, 2.62, 2.65, 2.68, 2.72, 2.75, 2.78, 2.81,
    2.83, 2.86, 2.88, 2.91, 2.93, 2.94, 2.96, 2.97, 2.97, 2.97, 2.97, 2.97,
    2.96, 2.95, 2.94, 2.93, 2.91, 2.89, 2.87, 2.85, 2.83, 2.80, 2.78, 2.75,
    2.72, 2.69, 2.67, 2.64, 2.64,
]) / 100.0

SMILE_MONEYNESS = [-0.02, -0.01, -0.005, -0.0025, 0.0, 0.0025, 0.0050, 0.01, 0.02]
SMILE_VOLS = [0.559, 0.377, 0.335, 0.320, 0.308, 0.298, 0.290, 0.280, 0.270]
ATM_MATURITIES = [2.0, 3.0, 4.0, 5.0, 7.0, 10.0, 15.0, 20.0, 25.0, 30.0]
ATM_VOLS = [0.385, 0.351, 0.325, 0.308, 0.288, 0.279, 0.290, 0.272, 0.235, 0.192]

LAST_TIME, DT = 20.0, 0.5
NUM_PERIODS = 20  # every product is on a 10Y swap (:227)


@dataclass
class BenchmarkCalibrationSetup:
    engine: LMMValuationEngine
    model: LIBORMarketModelTPU
    covariance: LIBORCovarianceModelStochasticVolatility
    products: List[SwaptionProduct]

    def calibrate(self, max_iterations: int = 30, accuracy: float = 1e-6,
                  lambda0: float = 0.1) -> LMResult:
        lm = LevenbergMarquardt(
            self.engine.residuals, self.engine.jacobian,
            lambda0=lambda0, max_iterations=max_iterations, accuracy=accuracy,
            lower_bound=-np.inf,  # rho may be negative
        )
        return lm.run(self.covariance.initial_parameters)

    def deviations(self, params) -> np.ndarray:
        return self.engine.implied_vols(params) - self.engine.targets


def build_benchmark_calibration(num_paths: int = 8192, num_factors: int = 5,
                                seed: int = 314151, mesh=None
                                ) -> BenchmarkCalibrationSetup:
    fc = ForwardCurveFromForwards(FIXING_TIMES, FORWARD_RATES, DT)
    dc = DiscountCurveFromForwardCurve(fc, horizon=50.0)

    libor_td = TimeDiscretization(initial=0.0, num_steps=int(LAST_TIME / DT), step=DT)
    tenor = np.asarray([libor_td.get_time(i) for i in range(len(libor_td))])

    quotes = [(5.0, m, v) for m, v in zip(SMILE_MONEYNESS, SMILE_VOLS)]
    quotes += [(t, 0.0, v) for t, v in zip(ATM_MATURITIES, ATM_VOLS)]

    products: List[SwaptionProduct] = []
    for exercise, moneyness, vol in quotes:
        e = int(round(exercise / DT))
        if e + NUM_PERIODS > libor_td.get_number_of_time_steps():
            continue  # beyond the 20Y grid: the reference skips via try/catch
        strike = moneyness + par_swap_rate(fc, dc, tenor[e : e + NUM_PERIODS + 1])
        products.append(SwaptionProduct(
            exercise_index=e, num_periods=NUM_PERIODS, strike=strike,
            target=vol, weight=1.0, value_unit="VOLATILITYLOGNORMAL",
        ))

    covariance = LIBORCovarianceModelExponentialForm5Param(
        libor_td, libor_td, num_factors, (0.20, 0.05, 0.10, 0.05, 0.10)
    )
    covariance = BlendedLocalVolatilityModel(covariance, blend=0.2,
                                             is_calibrateable=True)
    covariance = LIBORCovarianceModelStochasticVolatility(
        covariance, nu=0.15, rho=0.20, is_calibrateable=True
    )

    model = LIBORMarketModelTPU(
        libor_td, fc, dc, covariance,
        measure="spot", state_space="normal",
        use_numeraire_adjustment=False,  # ref. passes discountCurve=null
    )
    engine = LMMValuationEngine(model, products, num_paths, num_factors,
                                seed, mesh=mesh)
    return BenchmarkCalibrationSetup(
        engine=engine, model=model, covariance=covariance, products=products
    )
