from .time_discretization import TimeDiscretization
from .brownian_motion import (
    BrownianMotion,
    BrownianMotionHostRandom,
    BrownianMotionTPUWithHostRandomVariable,
    BrownianMotionView,
)
from .calibration import (
    BatchedLevenbergMarquardt,
    LevenbergMarquardt,
    LMResult,
)
from .hull_white import (
    HullWhiteCalibrationResult,
    HullWhiteModel,
    HullWhiteSimulation,
    calibrate_hull_white,
)
from .merton import (
    MertonCalibrationResult,
    MertonParams,
    MonteCarloMertonModel,
    calibrate_merton,
    mc_merton_european_prices,
    merton_series_prices,
)
from .heston import (
    HestonCalibrationResult,
    HestonModel,
    HestonParams,
    calibrate_heston,
    heston_characteristic_prices,
    mc_heston_european_prices,
)

__all__ = [
    "HullWhiteCalibrationResult",
    "HullWhiteModel",
    "HullWhiteSimulation",
    "calibrate_hull_white",
    "MertonCalibrationResult",
    "MertonParams",
    "MonteCarloMertonModel",
    "calibrate_merton",
    "mc_merton_european_prices",
    "merton_series_prices",
    "HestonCalibrationResult",
    "HestonModel",
    "HestonParams",
    "calibrate_heston",
    "heston_characteristic_prices",
    "mc_heston_european_prices",
    "TimeDiscretization",
    "BrownianMotion",
    "BrownianMotionHostRandom",
    "BrownianMotionTPUWithHostRandomVariable",
    "BrownianMotionView",
    "BatchedLevenbergMarquardt",
    "LevenbergMarquardt",
    "LMResult",
]
