from .random_variable import RandomVariable, RandomVariableTPU, RandomVariableTPUFactory
from .random_variable_float import RandomVariableFloat, RandomVariableFloatFactory

__all__ = [
    "RandomVariable",
    "RandomVariableTPU",
    "RandomVariableTPUFactory",
    "RandomVariableFloat",
    "RandomVariableFloatFactory",
]
