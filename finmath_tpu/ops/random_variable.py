"""The TPU-native RandomVariable: an immutable vector of Monte-Carlo path
realizations plus a filtration time.

This is the TPU-first redesign of the reference's device vector type
(``RandomVariableCuda``, /root/reference/src/main/java/net/finmath/cuda/
montecarlo/RandomVariableCuda.java:88-1762). The semantic contract is kept —

* immutable (values, filtration time, type priority),
* float32 storage, float64-accumulated reductions
  (ref. RandomVariableCudaKernel.cu:287-349 accumulates f32 input in f64
  with Kahan compensation),
* a deterministic-scalar fast path on every operation
  (ref. RandomVariableCuda.java:1094, :1400-1407),
* ``max(filtrationTime)`` propagation on binary ops (ref. :1398),
* type-priority dispatch so mixed CPU/TPU/AAD operands resolve to the
  highest-priority implementation (ref. :1391-1394), with the bus/vid
  argument-flip trick for non-commutative ops (ref. :1456-1459, :1529-1532)

— but the architecture is not: the reference needs a hand-rolled device
memory pool (RandomVariableCuda.java:119-558) and one CUDA kernel launch per
operator because Java cannot see across op boundaries. Under JAX, eager ops
dispatch asynchronously to XLA (which owns buffer lifetime — the pool is
obsolete) and every hot loop in ``finmath_tpu.models`` runs under ``jit``
where XLA fuses the whole elementwise chain into a handful of TPU loops.

Unlike the reference device class, nothing here is left unimplemented: the
reference's broken/missing corners (``choose`` returning null, ``apply``/
``sin``/``cos``/``isNaN`` throwing — see RandomVariableCuda.java:1146-1168,
:1355-1384, :1631-1635, :1700-1704) are all implemented properly.
"""

from __future__ import annotations

import math
import numbers
from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ._api import (
    TYPE_PRIORITY_TPU,
    det_eval as _det_eval,
    install_camel_aliases,
    quantile_index,
)
from .precise_math import exp32, log32, pow32

FLOAT_DTYPE = jnp.float32
ACC_DTYPE = jnp.float64  # reduction accumulator dtype


def _is_scalar(x) -> bool:
    return isinstance(x, numbers.Real) and not isinstance(x, bool)


class RandomVariable:
    """Abstract marker base so ``isinstance(x, RandomVariable)`` works across
    all implementations (TPU, CPU float oracle, AAD wrapper)."""

    __slots__ = ()


class RandomVariableTPU(RandomVariable):
    """Immutable TPU-resident float32 vector of path realizations + time.

    ``values`` is either a Python float (deterministic fast path — no device
    work at all, ref. RandomVariableCuda.java:1094) or a rank-1 ``float32``
    JAX array living in device HBM.
    """

    __slots__ = ("_time", "_values")

    _TYPE_PRIORITY = TYPE_PRIORITY_TPU

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    def __init__(self, time: float = 0.0, values=None, value: float = None):
        if values is None and value is not None:
            values = value
        if values is None:
            raise ValueError("RandomVariableTPU requires a value or values")
        self._time = float(time)
        if _is_scalar(values):
            self._values = float(values)
        elif isinstance(values, (list, tuple)):
            self._values = jnp.asarray(np.asarray(values, dtype=np.float32))
        elif isinstance(values, np.ndarray):
            if values.ndim == 0:
                self._values = float(values)
            else:
                self._values = jnp.asarray(values.astype(np.float32, copy=False))
        elif isinstance(values, jax.Array):
            if values.ndim == 0 and not isinstance(values, jax.core.Tracer):
                # normalize concrete 0-d arrays to the deterministic
                # (Python float) representation so round-trips through
                # jit/vmap keep the fast path intact
                self._values = float(values)
            else:
                self._values = values.astype(FLOAT_DTYPE)
        else:
            raise TypeError(f"unsupported values type: {type(values)}")

    @classmethod
    def of(cls, time: float, values) -> "RandomVariableTPU":
        """Wrap existing values without copying (trusted internal path)."""
        rv = object.__new__(cls)
        rv._time = float(time)
        rv._values = values
        return rv

    @classmethod
    def from_random_variable(cls, other: "RandomVariable") -> "RandomVariableTPU":
        """Upload another implementation's realizations to the device
        (ref. getRandomVariableCuda, RandomVariableCuda.java:759-766)."""
        if isinstance(other, RandomVariableTPU):
            return other
        if other.is_deterministic():
            return cls(other.get_filtration_time(), other.double_value())
        return cls(other.get_filtration_time(), np.asarray(other.get_realizations()))

    # ------------------------------------------------------------------
    # inspection
    # ------------------------------------------------------------------
    def get_filtration_time(self) -> float:
        return self._time

    def get_type_priority(self) -> int:
        return self._TYPE_PRIORITY

    def is_deterministic(self) -> bool:
        return not isinstance(self._values, jax.Array)

    def size(self) -> int:
        if self.is_deterministic():
            return 1
        # a formerly-deterministic RV re-entering through jit is a 0-d
        # tracer (pytree unflatten cannot turn tracers back into floats)
        return 1 if self._values.ndim == 0 else int(self._values.shape[0])

    def double_value(self) -> float:
        if not self.is_deterministic():
            raise ValueError("doubleValue on a stochastic random variable")
        return float(self._values)

    def get(self, index: int) -> float:
        """Single realization. Note the reference device class throws here
        for stochastic variables (RandomVariableCuda.java:812-818); we
        implement it (device fetch of one element)."""
        if self.is_deterministic():
            return float(self._values)
        return float(self._values[index])

    def get_realizations(self) -> np.ndarray:
        """Host copy of all realizations (synchronizes, like the reference's
        D->H getValuesAsFloat, RandomVariableCuda.java:469-481)."""
        if self.is_deterministic():
            raise ValueError("getRealizations on a deterministic random variable")
        return np.asarray(self._values)

    @property
    def values(self):
        """Raw backing value: Python float or jnp float32 array [paths]."""
        return self._values

    def cache(self) -> "RandomVariableTPU":
        """Materialize pending async computation (ref. cache() is a no-op,
        RandomVariableCuda.java:1098-1112; here it blocks on the device
        value so repeated reductions don't re-enqueue)."""
        if not self.is_deterministic():
            self._values.block_until_ready()
        return self

    def get_operator(self):  # parity with finmath API surface
        return None

    def get_realizations_stream(self):
        """Iterator over realizations (finmath's getRealizationsStream —
        which the reference device class leaves as null,
        RandomVariableCuda.java:1133-1143)."""
        if self.is_deterministic():
            return iter([float(self._values)])
        return iter(np.asarray(self._values))

    def __repr__(self) -> str:
        if self.is_deterministic():
            return f"RandomVariableTPU(time={self._time}, value={self._values})"
        return (
            f"RandomVariableTPU(time={self._time}, size={self.size()}, "
            f"dtype={self._values.dtype})"
        )

    def equals(self, other: "RandomVariable") -> bool:
        """Value equality (the reference device class throws here,
        RandomVariableCuda.java:784-799 — implemented properly)."""
        if self._time != other.get_filtration_time():
            return False
        if self.is_deterministic() and other.is_deterministic():
            return self.double_value() == other.double_value()
        if self.is_deterministic() != other.is_deterministic():
            return False
        a = self.get_realizations()
        b = np.asarray(other.get_realizations())
        return a.shape == b.shape and bool(np.all(a == b))

    # ------------------------------------------------------------------
    # dispatch helpers
    # ------------------------------------------------------------------
    def _defer(self, other) -> bool:
        return (
            isinstance(other, RandomVariable)
            and other.get_type_priority() > self.get_type_priority()
        )

    def _dev(self, other: "RandomVariable"):
        """Other's values as (is_deterministic, float-or-jnp-array)."""
        o = RandomVariableTPU.from_random_variable(other)
        return o.is_deterministic(), o._values

    def _new_time(self, other: "RandomVariable") -> float:
        return max(self._time, other.get_filtration_time())

    # ------------------------------------------------------------------
    # unary ops
    # ------------------------------------------------------------------
    def _unary(self, scalar_fn: Callable, array_fn: Callable) -> "RandomVariableTPU":
        if self.is_deterministic():
            return type(self).of(self._time, _det_eval(scalar_fn, self._values))
        return type(self).of(self._time, array_fn(self._values))

    def squared(self):
        return self._unary(lambda x: x * x, lambda v: v * v)

    def sqrt(self):
        return self._unary(np.sqrt, jnp.sqrt)

    # exp/log/pow use the ~1-ULP f32 implementations from precise_math:
    # TPU's native transcendentals are fast approximations (log ~3.7e-4 rel)
    # that would break the reference's 1e-7 CPU/TPU parity contract.
    def exp(self):
        return self._unary(np.exp, exp32)

    def log(self):
        return self._unary(np.log, log32)

    def sin(self):
        return self._unary(np.sin, jnp.sin)

    def cos(self):
        return self._unary(np.cos, jnp.cos)

    def invert(self):
        return self._unary(lambda x: 1.0 / x, lambda v: 1.0 / v)

    def abs(self):
        return self._unary(abs, jnp.abs)

    def is_nan(self):
        """1.0 where NaN else 0.0 (ref. returns null on device,
        RandomVariableCuda.java:1700-1704 — implemented)."""
        return self._unary(
            lambda x: 1.0 if math.isnan(x) else 0.0,
            lambda v: jnp.isnan(v).astype(FLOAT_DTYPE),
        )

    def average(self) -> "RandomVariableTPU":
        """The mean as a deterministic RandomVariable."""
        return type(self).of(self._time, self.get_average())

    # ------------------------------------------------------------------
    # binary ops with scalars
    # ------------------------------------------------------------------
    def _scalar_op(self, value: float, scalar_fn, array_fn) -> "RandomVariableTPU":
        value = float(value)
        if self.is_deterministic():
            return type(self).of(self._time, _det_eval(scalar_fn, self._values, value))
        return type(self).of(self._time, array_fn(self._values, value))

    def cap(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, min, jnp.minimum, "cap")
        return self._scalar_op(other, min, jnp.minimum)

    def floor(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, max, jnp.maximum, "floor")
        return self._scalar_op(other, max, jnp.maximum)

    def add(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: a + b, lambda a, b: a + b, "add")
        return self._scalar_op(other, lambda a, b: a + b, lambda a, b: a + b)

    def sub(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: a - b, lambda a, b: a - b, "sub")
        return self._scalar_op(other, lambda a, b: a - b, lambda a, b: a - b)

    def bus(self, other):
        """Reverse subtraction: other - self (ref. busScalar kernel,
        RandomVariableCudaKernel.cu:44; arg-flip at RandomVariableCuda.java:1456-1459)."""
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: b - a, lambda a, b: b - a, "bus")
        return self._scalar_op(other, lambda a, b: b - a, lambda a, b: b - a)

    def mult(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: a * b, lambda a, b: a * b, "mult")
        return self._scalar_op(other, lambda a, b: a * b, lambda a, b: a * b)

    def div(self, other):
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: a / b, lambda a, b: a / b, "div")
        return self._scalar_op(other, lambda a, b: a / b, lambda a, b: a / b)

    def vid(self, other):
        """Reverse division: other / self (ref. vidScalar kernel,
        RandomVariableCudaKernel.cu:76)."""
        if isinstance(other, RandomVariable):
            return self._binary(other, lambda a, b: b / a, lambda a, b: b / a, "vid")
        return self._scalar_op(other, lambda a, b: b / a, lambda a, b: b / a)

    def pow(self, exponent: float):
        exponent = float(exponent)
        return self._unary(
            lambda x: np.power(x, exponent), lambda v: pow32(v, exponent)
        )

    # ------------------------------------------------------------------
    # binary ops with random variables (type-priority dispatch)
    # ------------------------------------------------------------------
    _FLIP = {"add": "add", "mult": "mult", "cap": "cap", "floor": "floor",
             "sub": "bus", "bus": "sub", "div": "vid", "vid": "div"}

    def _binary(self, other, scalar_fn, array_fn, name: str) -> "RandomVariableTPU":
        if self._defer(other):
            # delegate to the higher-priority implementation, flipping the
            # operation for non-commutative ops (ref. RandomVariableCuda.java:1392-1395)
            return getattr(other, self._FLIP[name])(self)
        new_time = self._new_time(other)
        o_det, o_vals = self._dev(other)
        s_det = self.is_deterministic()
        if s_det and o_det:
            return type(self).of(new_time, _det_eval(scalar_fn, self._values, o_vals))
        return type(self).of(new_time, array_fn(self._values, o_vals))

    # ------------------------------------------------------------------
    # fused financial ops (ref. dedicated kernels accrue/discount/addProduct,
    # RandomVariableCudaKernel.cu:224-285 — under jit XLA fuses these chains;
    # keeping them as single methods preserves the API and gives the
    # eager path one fused jaxpr instead of three ops)
    # ------------------------------------------------------------------
    def accrue(self, rate: "RandomVariable", period_length: float):
        """self * (1 + rate * periodLength)."""
        if self._defer(rate):
            return rate.mult(period_length).add(1.0).mult(self)
        new_time = max(self._time, rate.get_filtration_time()) if isinstance(rate, RandomVariable) else self._time
        if isinstance(rate, RandomVariable):
            r_det, r = self._dev(rate)
        else:
            r_det, r = True, float(rate)
        p = float(period_length)
        if self.is_deterministic() and r_det:
            return type(self).of(new_time, float(self._values) * (1.0 + float(r) * p))
        return type(self).of(new_time, self._values * (1.0 + r * p))

    def discount(self, rate: "RandomVariable", period_length: float):
        """self / (1 + rate * periodLength)."""
        if self._defer(rate):
            return rate.mult(period_length).add(1.0).vid(self)
        new_time = max(self._time, rate.get_filtration_time()) if isinstance(rate, RandomVariable) else self._time
        if isinstance(rate, RandomVariable):
            r_det, r = self._dev(rate)
        else:
            r_det, r = True, float(rate)
        p = float(period_length)
        if self.is_deterministic() and r_det:
            return type(self).of(
                new_time,
                _det_eval(lambda s, rr: s / (1.0 + rr * p), self._values, r))
        return type(self).of(new_time, self._values / (1.0 + r * p))

    def add_product(self, factor1: "RandomVariable", factor2):
        """self + factor1 * factor2 (factor2 scalar or RV; ref. addProduct /
        addProduct_vs kernels, RandomVariableCudaKernel.cu:247-266)."""
        if self._defer(factor1) or (
            isinstance(factor2, RandomVariable) and self._defer(factor2)
        ):
            return factor1.mult(factor2).add(self)
        new_time = max(self._time, factor1.get_filtration_time())
        f1_det, f1 = self._dev(factor1)
        if isinstance(factor2, RandomVariable):
            new_time = max(new_time, factor2.get_filtration_time())
            f2_det, f2 = self._dev(factor2)
        else:
            f2_det, f2 = True, float(factor2)
        if self.is_deterministic() and f1_det and f2_det:
            return type(self).of(new_time, float(self._values) + float(f1) * float(f2))
        return type(self).of(new_time, self._values + f1 * f2)

    def add_ratio(self, numerator: "RandomVariable", denominator: "RandomVariable"):
        """self + numerator / denominator (ref. addRatio kernel :267)."""
        return self.add(numerator.div(denominator)) if self._defer(numerator) or self._defer(denominator) else self._ratio(numerator, denominator, +1.0)

    def sub_ratio(self, numerator: "RandomVariable", denominator: "RandomVariable"):
        """self - numerator / denominator (ref. subRatio kernel :277)."""
        return self.sub(numerator.div(denominator)) if self._defer(numerator) or self._defer(denominator) else self._ratio(numerator, denominator, -1.0)

    def _ratio(self, numerator, denominator, sign: float):
        new_time = max(
            self._time,
            numerator.get_filtration_time(),
            denominator.get_filtration_time(),
        )
        n_det, n = self._dev(numerator)
        d_det, d = self._dev(denominator)
        if self.is_deterministic() and n_det and d_det:
            return type(self).of(
                new_time,
                _det_eval(lambda s, nn, dd: s + sign * nn / dd,
                          self._values, n, d))
        return type(self).of(new_time, self._values + sign * (n / d))

    def add_sum_product(
        self,
        factors1: Sequence["RandomVariable"],
        factors2: Sequence["RandomVariable"],
    ):
        """self + sum_i factors1[i] * factors2[i]
        (ref. RandomVariableFromFloatArray.java:1385-1392)."""
        result = self
        for f1, f2 in zip(factors1, factors2):
            result = result.add_product(f1, f2)
        return result

    def choose(self, value_if_nonneg: "RandomVariable", value_if_neg: "RandomVariable"):
        """Elementwise ternary on the sign of self (trigger). The reference
        device class returns null here (RandomVariableCuda.java:1631-1635) —
        implemented branch-free as required for Longstaff-Schwartz."""
        if self._defer(value_if_nonneg) or self._defer(value_if_neg):
            # delegate: trigger >= 0 ? a : b with higher-priority operands
            return value_if_nonneg.mult(self.ge_zero()).add_product(
                value_if_neg, self.ge_zero().bus(1.0)
            )
        new_time = max(
            self._time,
            value_if_nonneg.get_filtration_time(),
            value_if_neg.get_filtration_time(),
        )
        a_det, a = self._dev(value_if_nonneg)
        b_det, b = self._dev(value_if_neg)
        if self.is_deterministic():
            chosen = value_if_nonneg if float(self._values) >= 0 else value_if_neg
            out = RandomVariableTPU.from_random_variable(chosen)
            return type(self).of(new_time, out._values)
        return type(self).of(new_time, jnp.where(self._values >= 0, a, b))

    def ge_zero(self):
        """Indicator of self >= 0 (helper used by choose delegation)."""
        return self._unary(
            lambda x: 1.0 if x >= 0 else 0.0,
            lambda v: (v >= 0).astype(FLOAT_DTYPE),
        )

    # ------------------------------------------------------------------
    # apply (the reference device class throws, RandomVariableCuda.java:1146-1168;
    # jnp traces the callable so arbitrary functions run fused on device)
    # ------------------------------------------------------------------
    def apply(self, function: Callable, *args: "RandomVariable"):
        operands = [self] + [RandomVariableTPU.from_random_variable(a) for a in args]
        new_time = max(o.get_filtration_time() for o in operands)
        if all(o.is_deterministic() for o in operands):
            return type(self).of(
                new_time, float(function(*[float(o._values) for o in operands]))
            )
        vals = [
            o._values if not o.is_deterministic() else float(o._values)
            for o in operands
        ]
        return type(self).of(new_time, jnp.asarray(function(*vals), dtype=FLOAT_DTYPE))

    # ------------------------------------------------------------------
    # reductions: f32 input, f64 accumulation (ref. reduceFloatVectorToDoubleScalar,
    # RandomVariableCudaKernel.cu:287-315). jnp.sum with dtype=float64 lowers to
    # an XLA tree reduce with f64 accumulator — the Kahan-equivalent.
    # ------------------------------------------------------------------
    def get_average(self, probabilities: "RandomVariable" = None) -> float:
        if probabilities is not None:
            # expectation under the given measure: sum(x_i * p_i)
            # (ref. RandomVariableFromFloatArray.java:337-357 — no 1/n)
            p = RandomVariableTPU.from_random_variable(probabilities)
            if self.is_deterministic():
                if p.is_deterministic():
                    return float(self._values) * float(p._values)
                return float(self._values) * float(jnp.sum(p._values.astype(ACC_DTYPE)))
            if p.is_deterministic():
                return float(p._values) * float(jnp.sum(self._values.astype(ACC_DTYPE)))
            return float(
                jnp.sum(
                    self._values.astype(ACC_DTYPE) * p._values.astype(ACC_DTYPE)
                )
            )
        if self.is_deterministic():
            return float(self._values)
        return float(jnp.sum(self._values.astype(ACC_DTYPE))) / self.size()

    def get_variance(self, probabilities: "RandomVariable" = None) -> float:
        if self.is_deterministic():
            return 0.0
        if probabilities is not None:
            mean = self.get_average(probabilities)
            p = RandomVariableTPU.from_random_variable(probabilities)
            dev = self._values.astype(ACC_DTYPE) - mean
            return float(jnp.sum(dev * dev * p._values.astype(ACC_DTYPE)))
        mean = self.get_average()
        dev = self._values.astype(ACC_DTYPE) - mean
        return float(jnp.sum(dev * dev)) / self.size()

    def get_sample_variance(self) -> float:
        n = self.size()
        if n == 1 or self.is_deterministic():
            return 0.0
        return self.get_variance() * n / (n - 1)

    def get_standard_deviation(self, probabilities: "RandomVariable" = None) -> float:
        if self.is_deterministic():
            return 0.0
        return math.sqrt(self.get_variance(probabilities))

    def get_standard_error(self, probabilities: "RandomVariable" = None) -> float:
        if self.is_deterministic():
            return 0.0
        return self.get_standard_deviation(probabilities) / math.sqrt(self.size())

    def get_min(self) -> float:
        if self.is_deterministic():
            return float(self._values)
        return float(jnp.min(self._values))

    def get_max(self) -> float:
        if self.is_deterministic():
            return float(self._values)
        return float(jnp.max(self._values))

    def get_quantile(self, quantile: float, probabilities: "RandomVariable" = None) -> float:
        """On-device sort (the reference round-trips through the host,
        RandomVariableCuda.java:970-1091)."""
        if self.is_deterministic():
            return float(self._values)
        if probabilities is not None:
            order = jnp.argsort(self._values)
            p = RandomVariableTPU.from_random_variable(probabilities)
            if p.is_deterministic():
                pv = jnp.full((self.size(),), float(p.values), dtype=ACC_DTYPE)
            else:
                pv = p.values[order].astype(ACC_DTYPE)
            cum = jnp.cumsum(pv)
            idx = jnp.searchsorted(cum, quantile)
            idx = jnp.clip(idx, 0, self.size() - 1)
            return float(self._values[order[idx]])
        sorted_vals = jnp.sort(self._values)
        return float(sorted_vals[quantile_index(self.size(), quantile)])

    def get_quantile_expectation(self, q_start: float, q_end: float) -> float:
        """Average of realizations between two quantiles (inclusive),
        finmath convention (RandomVariableFromDoubleArray semantics)."""
        if self.is_deterministic():
            return float(self._values)
        if q_start > q_end:
            return self.get_quantile_expectation(q_end, q_start)
        n = self.size()
        lo = quantile_index(n, q_start)
        hi = quantile_index(n, q_end)
        sorted_vals = jnp.sort(self._values)
        return float(
            jnp.sum(sorted_vals[lo : hi + 1].astype(ACC_DTYPE))
        ) / (hi - lo + 1)

    def get_histogram(self, interval_points=None, number_of_points: int = None,
                      standard_deviations: float = None):
        """Histogram frequencies (normalized by size).

        Two forms as in finmath: explicit interval points -> array of
        len(points)+1 frequencies (outer bins are open); or
        (numberOfPoints, standardDeviations) -> [2][n] array of mid points
        and frequencies.
        """
        if interval_points is not None:
            pts = np.asarray(interval_points, dtype=np.float64)
            if self.is_deterministic():
                counts = np.zeros(len(pts) + 1)
                counts[int(np.searchsorted(pts, float(self._values), side="right"))] = 1.0
                return counts
            idx = jnp.searchsorted(jnp.asarray(pts), self._values.astype(ACC_DTYPE), side="right")
            counts = jnp.bincount(idx, length=len(pts) + 1)
            return np.asarray(counts, dtype=np.float64) / self.size()
        # (numberOfPoints, standardDeviations) form
        mean = self.get_average()
        std = self.get_standard_deviation()
        lower = mean - standard_deviations * std
        upper = mean + standard_deviations * std
        pts = np.linspace(lower, upper, number_of_points - 1) if number_of_points > 1 else np.array([mean])
        freqs = self.get_histogram(interval_points=pts)
        step = (upper - lower) / max(number_of_points - 2, 1)
        centers = np.concatenate([[pts[0] - step / 2], (pts[:-1] + pts[1:]) / 2, [pts[-1] + step / 2]]) if len(pts) > 1 else np.array([mean, mean])
        return np.stack([centers, freqs])

    def get_conditional_expectation(self, estimator):
        """Delegates to a regression estimator (Longstaff-Schwartz),
        ref. RandomVariableFromFloatArray.java:860-864."""
        return estimator.get_conditional_expectation(self)

    # ------------------------------------------------------------------
    # Python operator sugar
    # ------------------------------------------------------------------
    def __add__(self, other):
        return self.add(other)

    __radd__ = __add__

    def __sub__(self, other):
        return self.sub(other)

    def __rsub__(self, other):
        return self.bus(other)

    def __mul__(self, other):
        return self.mult(other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self.div(other)

    def __rtruediv__(self, other):
        return self.vid(other)

    def __pow__(self, exponent):
        return self.pow(exponent)

    def __neg__(self):
        return self.mult(-1.0)

    def __abs__(self):
        return self.abs()

    # ------------------------------------------------------------------
    # serialization (device pointers are not serializable in the reference —
    # RandomVariableCuda is not Serializable; here we round-trip via host)
    # ------------------------------------------------------------------
    def __getstate__(self):
        vals = self._values if self.is_deterministic() else np.asarray(self._values)
        return {"time": self._time, "values": vals}

    def __setstate__(self, state):
        self._time = state["time"]
        v = state["values"]
        self._values = v if _is_scalar(v) else jnp.asarray(v)


# Register as a pytree so RandomVariableTPU flows through jit/vmap/grad.
def _rv_flatten(rv: RandomVariableTPU):
    return (rv._values,), (rv._time,)


def _rv_unflatten(aux, children):
    v = children[0]
    # a deterministic (float) leaf comes back from jit as a concrete 0-d
    # array; restore the scalar representation (tracers stay as-is)
    if isinstance(v, jax.Array) and v.ndim == 0 and not isinstance(v, jax.core.Tracer):
        v = float(v)
    return RandomVariableTPU.of(aux[0], v)


jax.tree_util.register_pytree_node(RandomVariableTPU, _rv_flatten, _rv_unflatten)

install_camel_aliases(RandomVariableTPU)


class RandomVariableTPUFactory:
    """The injection point (ref. RandomVariableCudaFactory.java:18-35):
    models built with this factory execute per-path arithmetic on TPU."""

    def create_random_variable(self, time: float, values) -> RandomVariableTPU:
        return RandomVariableTPU(time, values)

    # finmath-style aliases
    createRandomVariable = create_random_variable

    def create_random_variable_from_array(self, time: float, values) -> RandomVariableTPU:
        return RandomVariableTPU(time, values)

    def __repr__(self):
        return "RandomVariableTPUFactory()"
