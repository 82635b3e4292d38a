"""Fixed-order Gauss-Legendre quadrature helpers.

The reference uses 3-point Gauss-Legendre everywhere (aux.hpp:52-54), both
for the free-streaming z-integrals and as the numeric rescue path when a
closed-form channel integral cancels to a negative value. We keep the same
order so the rescue values agree, exposed as vectorizable helpers.
"""

import math

import jax.numpy as jnp

# 3-point Gauss-Legendre nodes/weights on [-1, 1] (aux.hpp:53-54)
GL3_X = (-math.sqrt(3.0 / 5.0), 0.0, math.sqrt(3.0 / 5.0))
GL3_W = (5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0)


def gl3(f, a, b):
    """3-point Gauss-Legendre estimate of int_a^b f.

    ``a``/``b`` may be arrays; ``f`` must be elementwise.
    """
    half = (b - a) * 0.5
    mid = (b + a) * 0.5
    acc = 0.0
    for w, x in zip(GL3_W, GL3_X):
        acc = acc + w * f(half * x + mid)
    return half * acc


def gl3_2d(f, ay, by, ax_fn, bx_fn):
    """Tensor 3x3-point Gauss-Legendre of int_{ay}^{by} dy int_{ax(y)}^{bx(y)} dx f(y, x).

    Matches the nested rescue quadratures of the reference
    (e.g. nuSIprop.hpp:985-1005). ``ay``/``by`` may be arrays; ``ax_fn``,
    ``bx_fn`` map y to the inner limits.
    """
    hy = (by - ay) * 0.5
    my = (by + ay) * 0.5
    acc = 0.0
    for wy, xy in zip(GL3_W, GL3_X):
        y = hy * xy + my
        ax, bx = ax_fn(y), bx_fn(y)
        hx = (bx - ax) * 0.5
        mx = (bx + ax) * 0.5
        inner = 0.0
        for wx, xx in zip(GL3_W, GL3_X):
            inner = inner + wx * f(y, hx * xx + mx)
        acc = acc + wy * hx * inner
    return hy * acc


def gl3_segmented(f, a, b, n_segments):
    """n-segment composite 3-point GL of int_a^b f (nuSIprop.hpp:678-692)."""
    edges = jnp.linspace(a, b, n_segments + 1)
    lo = edges[:-1]
    hi = edges[1:]
    return jnp.sum(gl3(f, lo, hi))
