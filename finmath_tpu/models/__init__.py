from .time_discretization import TimeDiscretization
from .brownian_motion import BrownianMotion, BrownianMotionView

__all__ = ["TimeDiscretization", "BrownianMotion", "BrownianMotionView"]
