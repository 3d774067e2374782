from .lazy import (RandomVariableTPULazy, RandomVariableTPULazyFactory,
                   averages, flush)
from .random_variable import (RandomVariable, RandomVariableTPU,
                              RandomVariableTPUFactory)
from .random_variable_float import RandomVariableFloat, RandomVariableFloatFactory
from .tridiagonal import tridiagonal_matvec, tridiagonal_solve

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
    "tridiagonal_matvec",
    "tridiagonal_solve",
]
