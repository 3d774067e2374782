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
from .american import (
    BermudanOption,
    crr_american_price,
)
from .equity_products import (
    AsianOption,
    BarrierOption,
    DigitalOption,
    LookbackOption,
)
from .sabr import (
    SABRCalibrationResult,
    SABRParams,
    calibrate_sabr,
    mc_sabr_implied_vols,
    mc_sabr_option_prices,
    sabr_lognormal_implied_volatility,
    sabr_normal_implied_volatility,
)
from .structured_products import (
    AutocallableNote,
    ChooserOption,
    CliquetOption,
    CompoundOption,
    ForwardStartOption,
    autocallable_value_single_observation,
)
from .local_vol import (
    DupireLocalVolSurface,
    LocalVolatilityModel,
    MonteCarloLocalVolModel,
    SSVISurface,
    local_variance,
)
from .tarn import (
    TargetRedemptionNote,
    inverse_floater_value,
)
from .caps import (
    CapletVolatilityCurve,
    LIBORVolatilityModelFromCapletCurve,
    cap_value,
    implied_flat_cap_volatility,
    make_cap_schedule,
    strip_caplet_surface,
    strip_caplet_volatilities,
)
from .cross_currency import (
    CCSTrade,
    CrossCurrencyExposureEngine,
    CrossCurrencyModel,
    CrossCurrencySimulation,
    FXForwardTrade,
)
from .credit import (
    CIRPPIntensityModel,
    CIRPPSimulation,
    SurvivalCurve,
    WrongWayRiskCVAEngine,
    WWRCVAResult,
    bootstrap_survival_curve,
    cds_legs,
    cds_par_spread,
    cds_value,
    par_swap_rate,
)
from .risk import (
    MarketRiskEngine,
    OptionBook,
    RiskReport,
    expected_shortfall,
    kupiec_pvalue,
    value_at_risk,
)
from .commodity import (
    SchwartzSmithModel,
    SchwartzSmithSimulation,
)
from .inflation import (
    JarrowYildirimModel,
    JarrowYildirimSimulation,
)
from .portfolio_credit import (
    GaussianCopulaPortfolio,
    GaussianCopulaSimulation,
    lhp_expected_tranche_loss,
)
from .mlmc import (
    MLMCResult,
    mlmc_lookback_call,
)
from .importance_sampling import (
    mc_european_price_importance_sampled,
)
from .hedging import (
    DeltaHedgedPortfolio,
    VarianceSwap,
)
from .hw_bermudan import (
    BermudanSwaption,
    hw_bermudan_swaption_pde,
)
from .cube import (
    CMSReplicationPricer,
    LinearTSRAnnuityMapping,
    SwaptionCube,
    SwaptionSmile,
)
from .multi_asset import (
    BasketOption,
    ExchangeOption,
    MonteCarloMultiAssetBlackScholesModel,
    MultiAssetBlackScholesModel,
    RainbowOption,
    SpreadOption,
)
from .bachelier import (
    BachelierParams,
    DisplacedLognormalParams,
    bachelier_analytic_price,
    displaced_analytic_price,
    mc_bachelier_european_prices,
    mc_displaced_european_prices,
)
from .fourier import (
    black_scholes_cf,
    european_call_from_cf,
    heston_cf,
    merton_cf,
    variance_gamma_cf,
)
from .variance_gamma import (
    VarianceGammaCalibrationResult,
    VarianceGammaParams,
    calibrate_variance_gamma,
    mc_vg_european_prices,
    vg_analytic_prices,
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
    MonteCarloHestonModel,
    calibrate_heston,
    heston_characteristic_prices,
    mc_heston_european_prices,
)

__all__ = [
    "BermudanOption",
    "crr_american_price",
    "AsianOption",
    "BarrierOption",
    "DigitalOption",
    "LookbackOption",
    "BasketOption",
    "ExchangeOption",
    "MonteCarloMultiAssetBlackScholesModel",
    "MultiAssetBlackScholesModel",
    "RainbowOption",
    "SpreadOption",
    "SABRCalibrationResult",
    "SABRParams",
    "calibrate_sabr",
    "mc_sabr_implied_vols",
    "mc_sabr_option_prices",
    "sabr_lognormal_implied_volatility",
    "sabr_normal_implied_volatility",
    "CMSReplicationPricer",
    "LinearTSRAnnuityMapping",
    "SwaptionCube",
    "SwaptionSmile",
    "BermudanSwaption",
    "hw_bermudan_swaption_pde",
    "DeltaHedgedPortfolio",
    "VarianceSwap",
    "AutocallableNote",
    "autocallable_value_single_observation",
    "ChooserOption",
    "DupireLocalVolSurface",
    "LocalVolatilityModel",
    "MonteCarloLocalVolModel",
    "SSVISurface",
    "local_variance",
    "TargetRedemptionNote",
    "inverse_floater_value",
    "CapletVolatilityCurve",
    "LIBORVolatilityModelFromCapletCurve",
    "cap_value",
    "implied_flat_cap_volatility",
    "make_cap_schedule",
    "strip_caplet_surface",
    "strip_caplet_volatilities",
    "CliquetOption",
    "CompoundOption",
    "ForwardStartOption",
    "BachelierParams",
    "DisplacedLognormalParams",
    "bachelier_analytic_price",
    "displaced_analytic_price",
    "mc_bachelier_european_prices",
    "mc_displaced_european_prices",
    "black_scholes_cf",
    "european_call_from_cf",
    "heston_cf",
    "merton_cf",
    "variance_gamma_cf",
    "VarianceGammaCalibrationResult",
    "VarianceGammaParams",
    "calibrate_variance_gamma",
    "mc_vg_european_prices",
    "vg_analytic_prices",
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
    "MonteCarloHestonModel",
    "calibrate_heston",
    "heston_characteristic_prices",
    "mc_heston_european_prices",
    "CCSTrade",
    "CrossCurrencyExposureEngine",
    "CrossCurrencyModel",
    "CrossCurrencySimulation",
    "FXForwardTrade",
    "CIRPPIntensityModel",
    "CIRPPSimulation",
    "SurvivalCurve",
    "WrongWayRiskCVAEngine",
    "WWRCVAResult",
    "MarketRiskEngine",
    "OptionBook",
    "RiskReport",
    "expected_shortfall",
    "kupiec_pvalue",
    "value_at_risk",
    "SchwartzSmithModel",
    "SchwartzSmithSimulation",
    "JarrowYildirimModel",
    "JarrowYildirimSimulation",
    "GaussianCopulaPortfolio",
    "GaussianCopulaSimulation",
    "lhp_expected_tranche_loss",
    "bootstrap_survival_curve",
    "cds_legs",
    "cds_par_spread",
    "cds_value",
    "par_swap_rate",
    "TimeDiscretization",
    "BrownianMotion",
    "BrownianMotionHostRandom",
    "BrownianMotionTPUWithHostRandomVariable",
    "BrownianMotionView",
    "BatchedLevenbergMarquardt",
    "LevenbergMarquardt",
    "LMResult",
]
