"""Lazy-eager execution for the RandomVariable API: record ops, flush ONE
fused program.

The reference's core selling point is that the *eager* RandomVariable API
wins on device beyond ~5,000 paths (/root/reference/README.md:24-28) —
possible there because a CUDA kernel launch costs microseconds. JAX eager
dispatch is heavier, and over a remote-TPU tunnel each dispatch pays the
full round trip, so a 10-op eager chain pays 10 round trips while the
device does nanoseconds of work. The structural, TPU-first fix is
deferred execution:

* every operation on a :class:`RandomVariableTPULazy` records a node in
  an expression DAG instead of dispatching;
* the DAG is flushed as ONE jit-compiled XLA program at the points where
  a concrete value is semantically required — reductions
  (``getAverage``...), ``getRealizations``, ``get(i)``, ``equals``,
  explicit ``cache()`` (the reference's ``cache()`` is a no-op,
  RandomVariableCuda.java:1098-1112 — here it is the flush point), or
  :func:`flush` on any number of variables at once;
* compiled programs are cached by DAG *structure* — scalars enter as
  runtime arguments, so ``x.mult(2).add(1)`` and ``x.mult(3).add(7)``
  share one executable. An Euler loop whose per-step op chain is
  structurally identical compiles once and replays with new scalars.

Numerical contract: the SAME array implementations (the lambdas/ufuncs
of ``RandomVariableTPU``, including the ~1-ULP ``precise_math``
transcendentals) run inside the flushed program, and reductions keep the
f64 accumulation contract. Chains of +-*/min/max/where are BIT-identical
to the strict eager path; chains through the polynomial transcendentals
(exp/log/pow) may differ by 1 ULP on rare inputs because XLA's fused
codegen rounds fused multiply-adds differently than its eager per-op
kernels — the same 1-ULP tolerance the reference grants its device
backend (RandomVariableGPUTest.java:35-42, pointwise 1e-7*(1+|x|)).

Type priority: LAZY (25) sits between TPU (20) and AAD (30) — mixed
strict/lazy expressions defer INTO the lazy implementation through the
standard finmath priority dispatch (README.md:50-52), so one lazy leaf
makes the whole downstream chain lazy; AAD still outranks both.
"""

from __future__ import annotations

import operator
import threading
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ._api import install_camel_aliases
from .random_variable import (ACC_DTYPE, FLOAT_DTYPE, RandomVariable,
                              RandomVariableTPU)

TYPE_PRIORITY_LAZY = 25


# ---------------------------------------------------------------------------
# expression DAG
# ---------------------------------------------------------------------------

class LazyArray:
    """One deferred elementwise computation producing a [paths] f32 array.

    ``args`` holds child nodes (LazyArray), concrete device/host arrays
    (leaves) and Python floats (runtime scalar inputs). ``fn`` is the
    actual array implementation applied at flush time; program caching
    keys on ``fn``'s code object + closure constants, so the class-level
    lambdas of RandomVariableTPU (fresh objects, shared code) hit the
    same cache entry."""

    __slots__ = ("fn", "args", "shape", "value")

    def __init__(self, fn: Callable, args: tuple, shape: tuple):
        self.fn = fn
        self.args = args
        self.shape = shape
        self.value = None          # set once materialized

    # -- operator sugar so RandomVariableTPU's inline fused-op expressions
    # (accrue/discount/addProduct/..., e.g. `values * (1.0 + r * p)`)
    # stay lazy without modification
    def __add__(self, o):
        return node(operator.add, self, o)

    def __radd__(self, o):
        return node(operator.add, o, self)

    def __sub__(self, o):
        return node(operator.sub, self, o)

    def __rsub__(self, o):
        return node(operator.sub, o, self)

    def __mul__(self, o):
        return node(operator.mul, self, o)

    def __rmul__(self, o):
        return node(operator.mul, o, self)

    def __truediv__(self, o):
        return node(operator.truediv, self, o)

    def __rtruediv__(self, o):
        return node(operator.truediv, o, self)

    def __neg__(self):
        return node(operator.neg, self)


def _shape_of(a):
    if isinstance(a, LazyArray):
        return a.shape
    if isinstance(a, (jax.Array, np.ndarray)):
        return tuple(a.shape)
    return ()


def node(fn: Callable, *args) -> LazyArray:
    """Create a DAG node; shape = first array-shaped argument (every op in
    the RandomVariable API is elementwise over the path axis)."""
    shape = ()
    for a in args:
        s = _shape_of(a)
        if s:
            shape = s
            break
    return LazyArray(fn, args, shape)


def _fn_key(fn: Callable):
    """Stable structural identity of an op implementation: code object +
    closure constants for Python functions (class-level lambdas share
    their code object across calls; closures carry floats like the pow
    exponent), the object itself for module-level callables."""
    code = getattr(fn, "__code__", None)
    if code is None:
        return fn
    cells = fn.__closure__ or ()
    try:
        return (code, tuple(c.cell_contents for c in cells))
    except TypeError:          # unhashable closure (defensive)
        return (code, id(fn))


_PROGRAM_CACHE: dict = {}
_CACHE_LOCK = threading.Lock()


def _flush(roots) -> list:
    """Materialize every root with ONE jitted program (cached by DAG
    structure). Already-materialized nodes act as leaves, so incremental
    flushing re-uses earlier results instead of recomputing the prefix."""
    post: list[LazyArray] = []
    index: dict[int, int] = {}

    # iterative post-order (deep Euler chains overflow recursion limits)
    for root in roots:
        if not isinstance(root, LazyArray) or root.value is not None:
            continue
        stack = [(root, False)]
        while stack:
            n, expanded = stack.pop()
            if id(n) in index:
                continue
            if expanded:
                index[id(n)] = len(post)
                post.append(n)
            else:
                stack.append((n, True))
                for a in n.args:
                    if isinstance(a, LazyArray) and a.value is None \
                            and id(a) not in index:
                        stack.append((a, False))

    if not post:
        return [r.value if isinstance(r, LazyArray) else r for r in roots]

    leaves: list = []
    leaf_ids: dict[int, int] = {}
    scalars: list = []
    sig = []
    fns = []
    for n in post:
        arg_sig = []
        for a in n.args:
            if isinstance(a, LazyArray):
                if a.value is not None:        # materialized: leaf
                    j = leaf_ids.setdefault(id(a), len(leaves))
                    if j == len(leaves):
                        leaves.append(a.value)
                    arg_sig.append(("l", j))
                else:
                    arg_sig.append(("n", index[id(a)]))
            elif isinstance(a, (jax.Array, np.ndarray)):
                j = leaf_ids.setdefault(id(a), len(leaves))
                if j == len(leaves):
                    leaves.append(a)
                arg_sig.append(("l", j))
            else:
                scalars.append(float(a))
                arg_sig.append(("s", len(scalars) - 1))
        sig.append((_fn_key(n.fn), tuple(arg_sig)))
        fns.append(n.fn)
    root_sig = tuple(
        index[id(r)] if isinstance(r, LazyArray) and r.value is None
        else ("done", roots.index(r))
        for r in roots
    )
    key = (tuple(sig), root_sig,
           tuple((tuple(l.shape), str(l.dtype)) for l in leaves))

    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        arg_plan = [s[1] for s in sig]
        prog_fns = list(fns)

        def run(leaf_vals, scalar_vals):
            vals = []
            for f, plan in zip(prog_fns, arg_plan):
                args = tuple(
                    vals[i] if t == "n" else
                    leaf_vals[i] if t == "l" else scalar_vals[i]
                    for (t, i) in plan
                )
                vals.append(f(*args))
            return [vals[i] if isinstance(i, int) else None for i in root_sig]

        prog = jax.jit(run)
        with _CACHE_LOCK:
            _PROGRAM_CACHE.setdefault(key, prog)
        prog = _PROGRAM_CACHE[key]

    outs = prog(leaves, tuple(scalars))
    results = []
    for r, out in zip(roots, outs):
        if isinstance(r, LazyArray):
            if r.value is None:
                r.value = out
            results.append(r.value)
        else:
            results.append(r)
    return results


def program_cache_size() -> int:
    return len(_PROGRAM_CACHE)


def averages(*random_variables) -> list:
    """f64-accumulated means of many (lazy) RandomVariables with ONE
    device dispatch: every pending chain AND every reduction runs in a
    single fused program, the per-variable means are STACKED into one
    [K] vector inside the program, and a single host transfer carries the
    whole portfolio back (measured on the tunneled TPU: K separate scalar
    reads pay K dispatch RTTs — ~8x30 ms for an 8-product portfolio — the
    stacked read pays one). Non-lazy variables fall back to their own
    ``get_average``."""
    pend = []
    for rv in random_variables:
        if isinstance(rv, RandomVariableTPULazy) and isinstance(
                rv._values, LazyArray):
            pend.append(node(_avg_reduce, rv._values))
        else:
            pend.append(None)
    live = [n for n in pend if n is not None]
    if len(live) > 1:
        sums = np.asarray(_flush([node(_stack_scalars, *live)])[0])
    elif live:
        sums = np.asarray([float(_flush(live)[0])])
    result, i = [], 0
    for rv, n in zip(random_variables, pend):
        if n is None:
            result.append(rv.get_average())
        else:
            result.append(float(sums[i]) / rv.size())
            i += 1
    return result


def flush(*random_variables):
    """Materialize any number of lazy RandomVariables with one fused
    device program (a portfolio-wide flush: one dispatch for everything
    pending). Non-lazy / deterministic variables pass through."""
    roots = []
    for rv in random_variables:
        if isinstance(rv, RandomVariableTPULazy) and isinstance(
                rv._values, LazyArray):
            roots.append(rv._values)
    if roots:
        _flush(roots)
    return random_variables


# ---------------------------------------------------------------------------
# the lazy RandomVariable
# ---------------------------------------------------------------------------

def _avg_reduce(v):
    return jnp.sum(v.astype(ACC_DTYPE))


def _stack_scalars(*vs):
    return jnp.stack(vs)


def _weighted_sum(v, p):
    return jnp.sum(v.astype(ACC_DTYPE) * p.astype(ACC_DTYPE))


def _choose_where(t, a, b):
    return jnp.where(t >= 0, a, b)


class RandomVariableTPULazy(RandomVariableTPU):
    """RandomVariableTPU with deferred (recorded) stochastic execution.

    The deterministic fast path is inherited unchanged (host float math —
    zero dispatches either way). Stochastic values are ``LazyArray``
    expression nodes; any strict RandomVariableTPU operand entering a
    binary op defers here via type priority (LAZY 25 > TPU 20), making
    the combined expression lazy."""

    __slots__ = ()

    _TYPE_PRIORITY = TYPE_PRIORITY_LAZY

    # -- representation ------------------------------------------------
    def __init__(self, time: float = 0.0, values=None, value: float = None):
        if isinstance(values, LazyArray):
            self._time = float(time)
            self._values = values
            return
        super().__init__(time, values, value)

    def is_deterministic(self) -> bool:
        return not isinstance(self._values, (jax.Array, LazyArray))

    def size(self) -> int:
        if isinstance(self._values, LazyArray):
            return int(self._values.shape[0]) if self._values.shape else 1
        return super().size()

    def _concrete(self):
        """Force pending computation; returns the jnp array (or float)."""
        if isinstance(self._values, LazyArray):
            return _flush([self._values])[0]
        return self._values

    def _strict(self) -> RandomVariableTPU:
        """Materialized plain-TPU view of self (same time, same values)."""
        return RandomVariableTPU.of(self._time, self._concrete())

    # -- node builders instead of immediate dispatch -------------------
    def _unary(self, scalar_fn, array_fn):
        if self.is_deterministic():
            return super()._unary(scalar_fn, array_fn)
        return RandomVariableTPULazy.of(
            self._time, node(array_fn, self._values))

    def _scalar_op(self, value, scalar_fn, array_fn):
        if self.is_deterministic():
            return super()._scalar_op(value, scalar_fn, array_fn)
        return RandomVariableTPULazy.of(
            self._time, node(array_fn, self._values, float(value)))

    def _binary(self, other, scalar_fn, array_fn, name):
        if self._defer(other):
            return getattr(other, self._FLIP[name])(self)
        new_time = self._new_time(other)
        o_det, o_vals = self._dev(other)
        if self.is_deterministic() and o_det:
            return super()._binary(other, scalar_fn, array_fn, name)
        a = self._values if not self.is_deterministic() else float(self._values)
        b = o_vals if not o_det else float(o_vals)
        return RandomVariableTPULazy.of(new_time, node(array_fn, a, b))

    def _dev(self, other):
        """Other's values: lazy stays lazy, strict RVs contribute their
        raw arrays as leaves (no host round trip)."""
        if isinstance(other, RandomVariableTPU) and isinstance(
                other._values, LazyArray):
            return False, other._values
        if isinstance(other, RandomVariableTPULazy):
            return other.is_deterministic(), other._values
        o = RandomVariableTPU.from_random_variable(other)
        return o.is_deterministic(), o._values

    # choose needs jnp.where on three operands — build the node directly
    def choose(self, value_if_nonneg, value_if_neg):
        if self._defer(value_if_nonneg) or self._defer(value_if_neg):
            return value_if_nonneg.mult(self.ge_zero()).add_product(
                value_if_neg, self.ge_zero().bus(1.0))
        new_time = max(self._time, value_if_nonneg.get_filtration_time(),
                       value_if_neg.get_filtration_time())
        if self.is_deterministic():
            chosen = value_if_nonneg if float(self._values) >= 0 else value_if_neg
            _, v = self._dev(chosen)
            return RandomVariableTPULazy.of(new_time, v)
        a_det, a = self._dev(value_if_nonneg)
        b_det, b = self._dev(value_if_neg)
        a = float(a) if a_det else a
        b = float(b) if b_det else b
        return RandomVariableTPULazy.of(
            new_time, node(_choose_where, self._values, a, b))

    def apply(self, function, *args):
        """Arbitrary functions may not be shape-preserving or traceable in
        the deferred registry — materialize, then run strict."""
        strict_args = [a._strict() if isinstance(a, RandomVariableTPULazy)
                       else a for a in args]
        out = self._strict().apply(function, *strict_args)
        return RandomVariableTPULazy.of(out.get_filtration_time(), out.values)

    # -- flush points --------------------------------------------------
    def cache(self):
        """The flush point (the reference's cache() is a no-op; here it
        materializes the recorded program — one dispatch)."""
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().cache()

    def get_realizations(self):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_realizations()

    def get(self, index):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get(index)

    def get_realizations_stream(self):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_realizations_stream()

    def equals(self, other):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().equals(other)

    # -- reductions: fused INTO the flushed program (the transferred
    # result is the scalar, not the path vector) ------------------------
    def get_average(self, probabilities=None) -> float:
        if self.is_deterministic() or not isinstance(self._values, LazyArray):
            return super().get_average(probabilities)
        if probabilities is None:
            s = _flush([node(_avg_reduce, self._values)])[0]
            return float(s) / self.size()
        p = probabilities
        if isinstance(p, RandomVariable):
            p_det, p_vals = self._dev(p)
        else:
            p_det, p_vals = True, float(p)
        if p_det:
            s = _flush([node(_avg_reduce, self._values)])[0]
            return float(s) * float(p_vals)
        s = _flush([node(_weighted_sum, self._values, p_vals)])[0]
        return float(s)

    def get_variance(self, probabilities=None) -> float:
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_variance(probabilities)

    def get_min(self) -> float:
        if isinstance(self._values, LazyArray):
            return float(_flush([node(jnp.min, self._values)])[0])
        return super().get_min()

    def get_max(self) -> float:
        if isinstance(self._values, LazyArray):
            return float(_flush([node(jnp.max, self._values)])[0])
        return super().get_max()

    def get_quantile(self, quantile, probabilities=None) -> float:
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_quantile(quantile, probabilities)

    def get_quantile_expectation(self, q_start, q_end) -> float:
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_quantile_expectation(q_start, q_end)

    def get_histogram(self, interval_points=None, number_of_points=None,
                      standard_deviations=None):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().get_histogram(interval_points, number_of_points,
                                     standard_deviations)

    def __repr__(self):
        if isinstance(self._values, LazyArray):
            return (f"RandomVariableTPULazy(time={self._time}, "
                    f"size={self.size()}, pending)")
        return super().__repr__().replace("RandomVariableTPU",
                                          "RandomVariableTPULazy", 1)

    def __getstate__(self):
        if isinstance(self._values, LazyArray):
            self._values = self._concrete()
        return super().__getstate__()


# pytree: materialize at jit boundaries (a pending DAG is not a leaf)
def _lazy_flatten(rv: RandomVariableTPULazy):
    v = rv._values
    if isinstance(v, LazyArray):
        v = _flush([v])[0]
        rv._values = v
    return (v,), (rv._time,)


def _lazy_unflatten(aux, children):
    v = children[0]
    if isinstance(v, jax.Array) and v.ndim == 0 \
            and not isinstance(v, jax.core.Tracer):
        v = float(v)
    return RandomVariableTPULazy.of(aux[0], v)


jax.tree_util.register_pytree_node(
    RandomVariableTPULazy, _lazy_flatten, _lazy_unflatten)

install_camel_aliases(RandomVariableTPULazy)


class RandomVariableTPULazyFactory:
    """Factory for the lazy-eager implementation — inject it wherever the
    reference injects RandomVariableCudaFactory for an eager workload that
    should batch its dispatches (finmath-style models run unchanged; one
    fused program executes per reduction/realization read)."""

    def create_random_variable(self, time: float, values) -> RandomVariableTPULazy:
        return RandomVariableTPULazy(time, values)

    createRandomVariable = create_random_variable

    def create_random_variable_from_array(self, time, values):
        return RandomVariableTPULazy(time, values)

    def __repr__(self):
        return "RandomVariableTPULazyFactory()"
