from .lazy import (RandomVariableTPULazy, RandomVariableTPULazyFactory,
                   averages, flush)
from .random_variable import (RandomVariable, RandomVariableTPU,
                              RandomVariableTPUFactory)
from .random_variable_float import RandomVariableFloat, RandomVariableFloatFactory

__all__ = [
    "RandomVariable",
    "RandomVariableTPU",
    "RandomVariableTPUFactory",
    "RandomVariableTPULazy",
    "RandomVariableTPULazyFactory",
    "RandomVariableFloat",
    "RandomVariableFloatFactory",
    "averages",
    "flush",
]
