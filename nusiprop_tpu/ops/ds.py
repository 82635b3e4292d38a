"""Double-single (two-float) extended-precision arithmetic.

TPUs have no native float64: XLA emulates it, and Pallas/Mosaic kernels
cannot use f64 at all. This module provides error-free-transformation
("double-single") arithmetic on (hi, lo) float32 pairs — ~49 bits of
effective mantissa with float32 exponent range — written as pure jnp
elementwise functions so the SAME code runs in plain JAX (any dtype,
for testing in f32-pair-vs-f64 harnesses) and inside Pallas TPU kernels.

Algorithms: Knuth two_sum, Dekker split/two_prod (no FMA assumption —
Mosaic does not expose one), and the standard double-single add/mul/div
compositions (Dekker 1971; Hida-Li-Bailey QD). Relative error per op is
O(2^-2p+3) with p the base mantissa (f32: ~6e-14 worst case, ~1e-14
typical) — far inside this engine's physical gates (golden 1e-3, march
cross-checks 1e-11 in true f64).

Representation invariant: hi = fl(hi + lo), |lo| <= ulp(hi)/2.

RANGE: the low word sits ~24 binades below the value, so precision
degrades once |x| < ~1e-31 (lo goes subnormal) and the representation
dies at the f32 floor ~1e-38 — the same envelope as XLA's f64 emulation
on TPU. Consumers must keep magnitudes inside ~[1e-31, 1e31] (the
engine's RANGE SAFETY conventions already do).
"""

import jax.numpy as jnp

# Dekker splitter for float32 (2^12 + 1); for float64 testing use 2^27+1.
_SPLIT_F32 = 4097.0
_SPLIT_F64 = 134217729.0


def _splitter(x):
    return _SPLIT_F32 if x.dtype == jnp.float32 else _SPLIT_F64


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (no FMA)."""
    p = a * b
    c = _splitter(a) * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = _splitter(b) * b
    b_hi = c - (c - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def ds(x, dtype=jnp.float32):
    """Split a higher-precision array into a (hi, lo) pair."""
    hi = x.astype(dtype)
    lo = (x - hi.astype(x.dtype)).astype(dtype)
    return hi, lo


def to_f64(h, l):
    return h.astype(jnp.float64) + l.astype(jnp.float64)


def add(xh, xl, yh, yl):
    sh, se = two_sum(xh, yh)
    te, tf = two_sum(xl, yl)
    se = se + te
    sh, se = fast_two_sum(sh, se)
    se = se + tf
    return fast_two_sum(sh, se)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def neg(xh, xl):
    return -xh, -xl


def mul(xh, xl, yh, yl):
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return fast_two_sum(ph, pe)


def mul_f(xh, xl, y):
    """ds * plain float."""
    ph, pe = two_prod(xh, y)
    pe = pe + xl * y
    return fast_two_sum(ph, pe)


def div(xh, xl, yh, yl):
    """Long division with two corrections (Hida et al. dd_div)."""
    q1 = xh / yh
    rh, rl = sub(xh, xl, *mul_f(yh, yl, q1))
    q2 = rh / yh
    rh, rl = sub(rh, rl, *mul_f(yh, yl, q2))
    q3 = rh / yh
    qh, ql = fast_two_sum(q1, q2)
    return add(qh, ql, q3, jnp.zeros_like(q3))


def recip(yh, yl):
    one = jnp.ones_like(yh)
    zero = jnp.zeros_like(yh)
    return div(one, zero, yh, yl)
