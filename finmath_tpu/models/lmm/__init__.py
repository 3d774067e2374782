from .covariance import (
    DisplacedLocalVolatilityModel,
    BlendedLocalVolatilityModel,
    LIBORCorrelationModelExponentialDecay,
    LIBORCovarianceModelExponentialForm5Param,
    LIBORCovarianceModelFromVolatilityAndCorrelation,
    LIBORCovarianceModelStochasticVolatility,
    LIBORVolatilityModelPiecewiseConstant,
)
from .model import LIBORMarketModelTPU, LMMValuationEngine, SwaptionProduct
from .atm_calibration import ATMCalibrationSetup, build_atm_calibration
from .benchmark_calibration import (
    BenchmarkCalibrationSetup,
    build_benchmark_calibration,
)
from .analytic_approximation import LMMAnalyticSwaptionEngine
from .bermudan import BermudanSwaption, BermudanSwaptionPricer
from .products import CapFloor
from .exposure import (
    CSA,
    BermudanSwaptionTrade,
    ExposureProfile,
    IMProfile,
    NettingSetExposureEngine,
    SwapExposureEngine,
    SwapTrade,
    SwaptionExposureEngine,
    SwaptionTrade,
    bilateral_cva_from_profile,
    cva_from_profile,
    dva_from_profile,
    fva_from_profile,
    mva_from_im_profile,
)
from .eager import eager_swaption_valuation
from .hybrid import (
    EquityForwardTrade,
    EquityOptionTrade,
    HybridAssetLMM,
    HybridAutocallableNote,
    HybridExposureEngine,
)

__all__ = [
    "LIBORVolatilityModelPiecewiseConstant",
    "LIBORCorrelationModelExponentialDecay",
    "LIBORCovarianceModelExponentialForm5Param",
    "LIBORCovarianceModelFromVolatilityAndCorrelation",
    "LIBORCovarianceModelStochasticVolatility",
    "DisplacedLocalVolatilityModel",
    "BlendedLocalVolatilityModel",
    "LIBORMarketModelTPU",
    "LMMValuationEngine",
    "SwaptionProduct",
    "ATMCalibrationSetup",
    "build_atm_calibration",
    "BenchmarkCalibrationSetup",
    "build_benchmark_calibration",
    "LMMAnalyticSwaptionEngine",
    "BermudanSwaption",
    "BermudanSwaptionPricer",
    "CapFloor",
    "CSA",
    "ExposureProfile",
    "IMProfile",
    "NettingSetExposureEngine",
    "SwapExposureEngine",
    "SwapTrade",
    "SwaptionExposureEngine",
    "SwaptionTrade",
    "BermudanSwaptionTrade",
    "bilateral_cva_from_profile",
    "cva_from_profile",
    "dva_from_profile",
    "fva_from_profile",
    "mva_from_im_profile",
    "eager_swaption_valuation",
    "EquityForwardTrade",
    "EquityOptionTrade",
    "HybridAssetLMM",
    "HybridAutocallableNote",
    "HybridExposureEngine",
]
