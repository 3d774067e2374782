"""Accurate float32 transcendentals for TPU.

TPU's native f32 ``exp``/``log`` are fast hardware approximations: measured
on a v5 lite chip, ``jnp.log`` is only ~3.7e-4 max relative error and
``jnp.exp`` ~5e-6, versus the 1-2 ULP CUDA ``logf``/``expf`` the reference
relies on for its 1e-7-tolerance CPU/GPU parity sweep
(/root/reference/.../RandomVariableGPUTest.java:190-360, tolerance :217).

These functions recover ~1-2 ULP accuracy using classic fdlibm argument
reduction + minimax polynomials, expressed entirely in elementwise f32 ops
and integer bit manipulation — all VPU-friendly, all fusible by XLA. In the
bandwidth-bound elementwise chains of Monte-Carlo finance, the extra ~15
VPU flops per element are hidden behind the HBM traffic, so precision here
is essentially free — this is the TPU-native analog of the reference
compiling its kernels with ``nvcc -fmad false`` for bit parity
(/root/reference/.../JCudaUtils.java:69-70).

Used by the RandomVariable API (``exp``/``log``/``pow``) and by the fused
model kernels (Euler log-space transforms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32 = jnp.float32
_I32 = jnp.int32

# fdlibm e_logf.c constants
_LG = (
    0.66666662693,  # Lg1
    0.40000000596,  # Lg2
    0.28571429849,  # Lg3
    0.22222198546,  # Lg4
    0.18183572590,  # Lg5
    0.15313838422,  # Lg6
    0.14798198640,  # Lg7
)
_LN2_HI = 6.9313812256e-01
_LN2_LO = 9.0580006145e-06

# fdlibm e_expf.c constants
_EXP_LN2_HI = 6.9314575195e-01
_EXP_LN2_LO = 1.4286067653e-06
_INV_LN2 = 1.4426950216e+00
_EXP_P1 = 1.6666625440e-01
_EXP_P2 = -2.7667332906e-03


def log32(x: jax.Array) -> jax.Array:
    """~1-ULP float32 natural log (fdlibm algorithm, branch-free)."""
    x = jnp.asarray(x, dtype=_F32)
    bits0 = jax.lax.bitcast_convert_type(x, _I32)

    # normalize subnormals exactly via their integer mantissa:
    # x = m_int * 2^-149, so log x = log(float(m_int)) - 149 ln2.
    # (XLA flushes subnormals on f32->f64 convert, so bit games it is.)
    raw_exp0 = (bits0 >> 23) & 0xFF
    is_sub = (raw_exp0 == 0) & ((bits0 & 0x007FFFFF) != 0)
    x_norm = jnp.where(is_sub, (bits0 & 0x007FFFFF).astype(_F32), x)
    bits = jax.lax.bitcast_convert_type(x_norm, _I32)

    # decompose x = 2^k * m with m in [sqrt(2)/2, sqrt(2))
    raw_exp = (bits >> 23) & 0xFF
    hx = bits & 0x007FFFFF
    # i = 0x800000 if mantissa >= sqrt(2) else 0 (fdlibm trick)
    i = (hx + 0x4B7F64) & 0x00800000
    k = raw_exp - 127 + (i >> 23) - jnp.where(is_sub, 149, 0)
    m_bits = hx | (i ^ 0x3F800000)
    m = jax.lax.bitcast_convert_type(m_bits, _F32)

    f = m - _F32(1.0)
    s = f / (_F32(2.0) + f)
    z = s * s
    w = z * z
    t1 = w * (_F32(_LG[1]) + w * (_F32(_LG[3]) + w * _F32(_LG[5])))
    t2 = z * (_F32(_LG[0]) + w * (_F32(_LG[2]) + w * (_F32(_LG[4]) + w * _F32(_LG[6]))))
    r = t2 + t1
    hfsq = _F32(0.5) * f * f
    kf = k.astype(_F32)
    result = kf * _F32(_LN2_HI) - (
        (hfsq - (s * (hfsq + r) + kf * _F32(_LN2_LO))) - f
    )

    # special cases via bit tests (XLA CPU/TPU run DAZ: a subnormal x
    # compares equal to 0.0, so float comparisons would misclassify it)
    abs_bits = bits0 & 0x7FFFFFFF
    is_zero = abs_bits == 0
    is_neg = (bits0 < 0) & ~is_zero
    is_inf = abs_bits == 0x7F800000
    is_nan_ = abs_bits > 0x7F800000
    result = jnp.where(is_zero, -jnp.inf, result)
    result = jnp.where(is_inf, jnp.inf, result)
    result = jnp.where(is_neg | is_nan_, jnp.nan, result)
    return result


def exp32(x: jax.Array) -> jax.Array:
    """~1-ULP float32 exponential (fdlibm argument reduction + rational
    approximation), branch-free."""
    x = jnp.asarray(x, dtype=_F32)
    # clamp to the representable range; overflow/underflow handled at the end
    xc = jnp.clip(x, _F32(-87.33655), _F32(88.72283))

    k = jnp.round(xc * _F32(_INV_LN2))
    hi = xc - k * _F32(_EXP_LN2_HI)
    lo = k * _F32(_EXP_LN2_LO)
    r = hi - lo

    t = r * r
    c = r - t * (_F32(_EXP_P1) + t * _F32(_EXP_P2))
    y = _F32(1.0) + (r * c / (_F32(2.0) - c) - lo + hi)

    # scale by 2^k: split into two multiplies so k in [-150, 128] is safe
    ki = k.astype(_I32)
    k1 = ki >> 1
    k2 = ki - k1
    s1 = jax.lax.bitcast_convert_type((k1 + 127) << 23, _F32)
    s2 = jax.lax.bitcast_convert_type((k2 + 127) << 23, _F32)
    result = y * s1 * s2

    result = jnp.where(x > _F32(88.72283), jnp.inf, result)
    result = jnp.where(x < _F32(-87.33655), _F32(0.0), result)
    result = jnp.where(jnp.isnan(x), jnp.nan, result)
    return result


def pow32(x: jax.Array, y) -> jax.Array:
    """float32 power via exp32(y * log32(x)) with an f64 product of the
    logarithm (the reduction that dominates pow error). Handles the common
    finance cases (x > 0, plus integer-like exponents of negative x are NOT
    supported — matches jnp.power domain for floats)."""
    x = jnp.asarray(x, dtype=_F32)
    lg = log32(x).astype(jnp.float64) if jax.config.jax_enable_x64 else log32(x)
    z = (lg * y).astype(_F32)
    r = exp32(z)
    y_arr = jnp.asarray(y)
    at_zero = jnp.where(
        y_arr > 0, _F32(0.0), jnp.where(y_arr == 0, _F32(1.0), jnp.inf)
    )
    return jnp.where(x == 0.0, at_zero, r)



def expm1_32(x: jax.Array) -> jax.Array:
    """exp(x) - 1 without cancellation for small x."""
    x = jnp.asarray(x, dtype=_F32)
    small = jnp.abs(x) < _F32(1e-2)
    # degree-5 Taylor for small arguments (error < 1e-12 rel there)
    t = x * (1 + x * (_F32(0.5) + x * (_F32(1 / 6) + x * (_F32(1 / 24) + x * _F32(1 / 120)))))
    return jnp.where(small, t, exp32(x) - _F32(1.0))


def log1p_32(x: jax.Array) -> jax.Array:
    """log(1 + x) without cancellation for small x."""
    x = jnp.asarray(x, dtype=_F32)
    small = jnp.abs(x) < _F32(1e-2)
    # log1p(x) = x - x^2/2 + x^3/3 - x^4/4 + x^5/5 for small x
    t = x * (1 - x * (_F32(0.5) - x * (_F32(1 / 3) - x * (_F32(0.25) - x * _F32(0.2)))))
    return jnp.where(small, t, log32(_F32(1.0) + x))


@jax.jit
def gather_exp32(states, idx):
    """Jitted gather + exp32 for the simulation facades'
    ``get_asset_values``: eager exp32 over a [dates, paths] log-state
    matrix materializes ~5 full-size temporaries (one per masked fixup
    above) — ~5 GB at 250 dates x 1M paths, an observed
    RESOURCE_EXHAUSTED on the v5e; fused under jit it is one pass and
    one output buffer."""
    return exp32(states[idx])


@jax.jit
def gather_component_exp32(states, idx, component):
    """As gather_exp32 for [dates, components, paths] state layouts."""
    return exp32(states[idx, component])
