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

__all__ = [
    "TimeDiscretization",
    "BrownianMotion",
    "BrownianMotionHostRandom",
    "BrownianMotionTPUWithHostRandomVariable",
    "BrownianMotionView",
    "BatchedLevenbergMarquardt",
    "LevenbergMarquardt",
    "LMResult",
]
