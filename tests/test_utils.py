"""Tests for utils: reference-format spectrum I/O round-trip and Timer."""

import numpy as np
import pytest

from nusiprop_tpu.utils.io import load_spectrum, save_spectrum
from nusiprop_tpu.utils.profiling import Timer


def test_spectrum_roundtrip(tmp_path):
    E = np.geomspace(1e4, 1e9, 50)
    flx = np.exp(-np.arange(150).reshape(3, 50) / 10.0) * 1e11
    p = tmp_path / "spec.txt"
    save_spectrum(p, E, flx, fmt="%.17e  %.17e  %.17e  %.17e")
    E2, flx2 = load_spectrum(p)
    np.testing.assert_allclose(E2, E, rtol=1e-15)
    np.testing.assert_allclose(flx2, flx, rtol=1e-15)


def test_spectrum_format_matches_reference(tmp_path):
    """Header and row formatting must match the golden file exactly."""
    E = np.array([1.05925e4])
    flx = np.array([[1.9270e11], [1.9270e11], [1.9270e11]])
    p = tmp_path / "spec.txt"
    save_spectrum(p, E, flx)
    lines = p.read_text().splitlines()
    assert lines[0] == "# energy, flx_e, flx_mu, flx_ta "
    assert lines[1] == "1.05925e+04  1.9270e+11  1.9270e+11  1.9270e+11"


def test_spectrum_shape_check(tmp_path):
    with pytest.raises(ValueError):
        save_spectrum(tmp_path / "x.txt", np.ones(5), np.ones((3, 4)))


def test_timer():
    import jax.numpy as jnp

    t = Timer()
    t.start()
    x = jnp.arange(10.0) ** 2
    lap = t.stop(fence_on=x)
    assert lap > 0
    assert t.best == lap and t.mean == lap
