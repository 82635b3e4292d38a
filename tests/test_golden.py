"""The acceptance gate: reproduce the reference golden output.

tests/data/data_massless.txt is the product of the reference's test.py
(its exact configuration is at test.py:6-23): DSNB source, massless
lightest neutrino (NO), s-channel only, 100 bins over 1e4..1e9 eV.
BASELINE.json requires <0.1% per-bin relative error; the file itself is
printed at 4 significant digits, so agreement is limited to ~5e-5.
"""

import pathlib

import numpy as np
import pytest

import nusiprop_tpu as nu

GOLDEN = pathlib.Path(__file__).parent / "data" / "data_massless.txt"


@pytest.fixture(scope="module")
def golden_run():
    ev = nu.Evolver(
        mphi=5e6,
        si=2.0,
        norm=6,
        majorana=True,
        normal_ordering=True,
        N_bins_E=100,
        lEmin=4,
        lEmax=9,
        zmax=5,
        mntot=0.0 + np.sqrt(7.42e-5) + np.sqrt(2.514e-3),
        g=1e-6,
        non_resonant=False,
        phiphi=False,
        flav=2,
    )
    ev.evolve()
    ref = np.loadtxt(GOLDEN, skiprows=1)
    return ev, ref


def test_energy_grid(golden_run):
    ev, ref = golden_run
    E = ev.get_energies()
    assert E.shape == (100,)
    # golden file prints 6 significant digits
    np.testing.assert_allclose(E, ref[:, 0], rtol=1e-5)


def test_flux_within_gate(golden_run):
    ev, ref = golden_run
    flx = ev.get_flux_fla()
    for k in range(3):
        rel = np.abs(flx[k] - ref[:, k + 1]) / np.abs(ref[:, k + 1])
        assert rel.max() < 1e-3, f"flavor {k}: max rel err {rel.max():.3e}"


def test_flux_well_within_gate(golden_run):
    """We should really be at file-print precision, not just inside 0.1%."""
    ev, ref = golden_run
    flx = ev.get_flux_fla()
    rel = np.abs(flx - ref[:, 1:].T) / np.abs(ref[:, 1:].T)
    assert rel.max() < 2e-4


def test_flux_positive_and_spans_decades(golden_run):
    ev, _ = golden_run
    flx = ev.get_flux_fla()
    assert (flx > 0).all()
    assert flx.max() > 1e15 and flx.min() < 1e-50
