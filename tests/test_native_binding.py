"""NativeEvolver (ctypes -> C++ engine) vs the JAX Evolver.

The native engine is an independent implementation of the s-channel-only
algorithm; agreement to ~1e-12 on both source models (including the DSNB
golden configuration, which exercises the native Li2/Li3) is a strong
mutual correctness check.
"""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:  # pragma: no cover
    pytest.skip("no g++", allow_module_level=True)

import nusiprop_tpu as nu
from nusiprop_tpu.native_binding import NativeEvolver

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
GOLDEN_KW = dict(mphi=5e6, g=1e-6, mntot=MNTOT, si=2.0, norm=6,
                 N_bins_E=100, lEmin=4, lEmax=9, zmax=5,
                 non_resonant=False, phiphi=False, flav=2)


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-300))


@pytest.mark.parametrize("source,tol", [("dsnb", 1e-8), ("powerlaw", 1e-11)])
def test_matches_jax(source, tol):
    # dsnb tolerance is looser: the Fermi-Dirac source is an
    # antiderivative difference Lum_int(Ep) - Lum_int(Em)
    # (nuSIprop.hpp:659-662) that cancels ~9 digits at the lowest bins,
    # amplifying 1-ulp rounding differences between the two
    # implementations (their Li2/Li3 agree to machine precision —
    # verified against mpmath).
    nat = NativeEvolver(source=source, **GOLDEN_KW).evolve()
    jx = nu.Evolver(source=source, **GOLDEN_KW).evolve()
    assert _rel(nat.get_flux_fla(), jx.get_flux_fla()) < tol
    assert _rel(nat.get_flux(), jx.get_flux()) < tol
    np.testing.assert_allclose(nat.get_energies(), jx.get_energies(),
                               rtol=1e-14)


def test_golden_file():
    """The native engine independently reproduces the reference golden
    output (tests/data/data_massless.txt)."""
    import pathlib

    nat = NativeEvolver(source="dsnb", **GOLDEN_KW).evolve()
    ref = np.loadtxt(pathlib.Path(__file__).parent / "data"
                     / "data_massless.txt", skiprows=1)
    flx = nat.get_flux_fla()
    rel = np.abs(flx - ref[:, 1:].T) / np.abs(ref[:, 1:].T)
    assert rel.max() < 1e-3


def test_set_parameters_and_warning():
    # strong-coupling config so a parameter change visibly moves the flux
    nat = NativeEvolver(mphi=6e5, g=0.01, mntot=0.1, si=2.5, norm=1.0,
                        N_bins_E=60, lEmin=9, lEmax=14, source="powerlaw")
    with pytest.warns(UserWarning, match="not evolved"):
        assert nat.get_flux_fla().sum() == 0.0
    nat.evolve()
    f1 = nat.get_flux_fla().copy()
    nat.set_parameters(g=0.03)
    assert not nat.evolved
    nat.evolve()
    assert not np.allclose(f1, nat.get_flux_fla())


def test_non_resonant_matches_jax():
    """The full non-resonant channel set through the ctypes binding
    (nusi_nr.hpp) vs the JAX f64 path — test.cpp-style configuration."""
    kw = dict(mphi=6e5, g=0.01, mntot=0.1, si=2.5, norm=1.0,
              N_bins_E=60, lEmin=9, lEmax=14, zmax=5, flav=2,
              non_resonant=True, phiphi=False, source="powerlaw")
    nat = NativeEvolver(**kw).evolve()
    jx = nu.Evolver(**kw).evolve()
    assert _rel(nat.get_flux_fla(), jx.get_flux_fla()) < 1e-10


def test_energy_conservation_and_interp_match_jax():
    """The Python-side API completions (check_energy_conservation,
    interp_flux_*) agree with the JAX Evolver on the golden config."""
    nat = NativeEvolver(source="dsnb", **GOLDEN_KW)
    jx = nu.Evolver(source="dsnb", **GOLDEN_KW)
    d_nat = nat.check_energy_conservation()
    d_jx = jx.check_energy_conservation()
    assert abs(d_nat - d_jx) < 1e-6 * max(1.0, abs(d_jx))
    E = nat.get_energies()
    probe = np.geomspace(E[0], E[-1], 17)
    np.testing.assert_allclose(nat.interp_flux_mu(probe),
                               jx.interp_flux_mu(probe), rtol=1e-6)
    with pytest.raises(ValueError, match="outside"):
        nat.interp_flux_el(E[0] * 0.5)


def test_phiphi_matches_jax():
    """The phi-phi channel through the ctypes binding (nusi_pp.hpp, the
    same spline tables + precomputed weights the JAX engine uses) vs
    the JAX f64 path."""
    kw = dict(mphi=6e5, g=0.03, mntot=0.1, si=2.5, norm=1.0,
              N_bins_E=32, lEmin=9, lEmax=14, zmax=5, flav=2,
              non_resonant=True, phiphi=True, source="powerlaw")
    nat = NativeEvolver(**kw).evolve()
    jx = nu.Evolver(**kw).evolve()
    assert _rel(nat.get_flux_fla(), jx.get_flux_fla()) < 1e-10
    # and the channel contributes: without it the flux differs
    no_pp = NativeEvolver(**{**kw, "phiphi": False}).evolve()
    assert _rel(no_pp.get_flux_fla(), jx.get_flux_fla()) > 1e-3
