"""Double-single arithmetic vs float64 reference.

f32 pairs carry ~49 mantissa bits; each ds op must stay within a few
ulps of the f64 result over the magnitude ranges the march uses.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nusiprop_tpu.ops import ds

RNG = np.random.default_rng(7)


def _pairs(n=4096, lo=-12, hi=12):
    """Random f64 values spanning wide magnitudes.

    Kept inside ds's precision envelope: products of two +/-1e12
    values have low words ~1e-31 x 6e-8, still normal in f32.
    """
    x = RNG.uniform(-1, 1, n) * 10.0 ** RNG.uniform(lo, hi, n)
    return x


def _as_ds(x):
    return ds.ds(jnp.asarray(x, dtype=jnp.float64))


def _check(got_h, got_l, want, rtol):
    got = np.asarray(ds.to_f64(got_h, got_l))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert rel.max() < rtol, rel.max()


def test_two_sum_exact():
    a = jnp.asarray(RNG.uniform(-1, 1, 1000), dtype=jnp.float32)
    b = jnp.asarray(RNG.uniform(-1, 1, 1000) * 1e-6, dtype=jnp.float32)
    s, e = ds.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))


def test_two_prod_exact():
    a = jnp.asarray(RNG.uniform(-1, 1, 1000), dtype=jnp.float32)
    b = jnp.asarray(RNG.uniform(-1, 1, 1000), dtype=jnp.float32)
    p, e = ds.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(p.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact))


@pytest.mark.parametrize("op,npop", [
    (ds.add, np.add), (ds.sub, np.subtract), (ds.mul, np.multiply),
    (ds.div, np.divide),
])
def test_ds_ops(op, npop):
    x = _pairs()
    y = _pairs()
    if npop is np.add or npop is np.subtract:
        # same-magnitude operands exercise cancellation
        y = y * 0 + x * RNG.uniform(0.5, 2.0, x.size)
    xh, xl = _as_ds(x)
    yh, yl = _as_ds(y)
    want = npop(np.asarray(ds.to_f64(xh, xl)), np.asarray(ds.to_f64(yh, yl)))
    got = op(xh, xl, yh, yl)
    # ds(f32) carries ~49 bits; allow a few ulps
    _check(*got, want, rtol=3e-13)


def test_recip():
    x = _pairs()
    xh, xl = _as_ds(x)
    _check(*ds.recip(xh, xl), 1.0 / np.asarray(ds.to_f64(xh, xl)),
           rtol=3e-13)


def test_mul_f():
    x = _pairs()
    y = jnp.asarray(RNG.uniform(-2, 2, x.size), dtype=jnp.float32)
    xh, xl = _as_ds(x)
    want = np.asarray(ds.to_f64(xh, xl)) * np.asarray(
        y.astype(jnp.float64))
    _check(*ds.mul_f(xh, xl, y), want, rtol=3e-13)
