from .time_discretization import TimeDiscretization
from .brownian_motion import (
    BrownianMotion,
    BrownianMotionHostRandom,
    BrownianMotionTPUWithHostRandomVariable,
    BrownianMotionView,
)

__all__ = [
    "TimeDiscretization",
    "BrownianMotion",
    "BrownianMotionHostRandom",
    "BrownianMotionTPUWithHostRandomVariable",
    "BrownianMotionView",
]
