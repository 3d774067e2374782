from .covariance import (
    DisplacedLocalVolatilityModel,
    BlendedLocalVolatilityModel,
    LIBORCorrelationModelExponentialDecay,
    LIBORCovarianceModelFromVolatilityAndCorrelation,
    LIBORVolatilityModelPiecewiseConstant,
)
from .model import LIBORMarketModelTPU, LMMValuationEngine, SwaptionProduct

__all__ = [
    "LIBORVolatilityModelPiecewiseConstant",
    "LIBORCorrelationModelExponentialDecay",
    "LIBORCovarianceModelFromVolatilityAndCorrelation",
    "DisplacedLocalVolatilityModel",
    "BlendedLocalVolatilityModel",
    "LIBORMarketModelTPU",
    "LMMValuationEngine",
    "SwaptionProduct",
]
