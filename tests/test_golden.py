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

pytestmark = pytest.mark.smoke

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


# ---------------------------------------------------------------------------
# Non-resonant regression fixture (no reference-produced golden exists:
# the reference's C++ does not compile here — GSL and the polylogarithm
# sources are absent — so this fixture is OURS, produced by the
# oracle-validated f64 CPU path and pinned for regression).
# ---------------------------------------------------------------------------

NR_GOLDEN = pathlib.Path(__file__).parent / "data" / "data_nonresonant_cpp.txt"


@pytest.fixture(scope="module")
def nr_golden_run():
    """test.cpp parameter point (test.cpp:6-20: mphi=6e5, g=0.01,
    mntot=0.1, si=2.5, norm=6, 100 bins over 1e9..1e14 eV,
    non_resonant=true, phiphi=false) with the UPSTREAM power-law source.

    Provenance: tests/data/data_nonresonant_cpp.txt was produced by this
    package's float64 CPU trisolve path (march='trisolve',
    table_dtype='f64'), which is oracle-validated channel-by-channel
    against scipy/mpmath (test_kernels_nr) and independently reproduced
    by the native C++ engine to ~4e-14 (test_serial_baseline). The
    source deviates from test.cpp deliberately: the fork's active DSNB
    source is ~e^-166 at these energies (pure Fermi-Dirac tail noise,
    peak flux ~1e-66), so the upstream power-law source is used to give
    the channels a physically meaningful spectrum to act on.
    """
    from nusiprop_tpu.config import Config, PhysicsParams
    from nusiprop_tpu.models import transport

    cfg = Config(N_bins_E=100, lEmin=9.0, lEmax=14.0, zmax=5.0, flav=2,
                 majorana=True, normal_ordering=True, non_resonant=True,
                 phiphi=False, source="powerlaw", march="trisolve",
                 table_dtype="f64")
    p = PhysicsParams.create(6e5, 0.01, 0.1, 2.5, 6.0)
    res = transport.evolve(p, cfg)
    ref = np.loadtxt(NR_GOLDEN)
    return res, ref


def test_nr_energy_grid(nr_golden_run):
    res, ref = nr_golden_run
    np.testing.assert_allclose(np.asarray(res.E_nu), ref[:, 0], rtol=1e-14)


def test_nr_flux_pinned(nr_golden_run):
    """f64 path must reproduce the pinned fixture to float64 round-off."""
    res, ref = nr_golden_run
    flx = np.asarray(res.flux_fla)
    np.testing.assert_allclose(flx, ref[:, 1:].T, rtol=1e-10)


def test_nr_flux_f32_table_within_gate(nr_golden_run):
    """The native-f32 quadrature alpha build stays within the physics
    gate (1e-3) of the pinned f64 fixture — and in practice ~1e-7 here
    (the closed forms are healthy at these O(1) coordinates)."""
    from nusiprop_tpu.config import Config, PhysicsParams
    from nusiprop_tpu.models import transport

    _, ref = nr_golden_run
    cfg = Config(N_bins_E=100, lEmin=9.0, lEmax=14.0, zmax=5.0, flav=2,
                 majorana=True, normal_ordering=True, non_resonant=True,
                 phiphi=False, source="powerlaw", march="trisolve",
                 table_dtype="f32")
    p = PhysicsParams.create(6e5, 0.01, 0.1, 2.5, 6.0)
    flx = np.asarray(transport.evolve(p, cfg).flux_fla)
    rel = np.abs(flx - ref[:, 1:].T) / np.abs(ref[:, 1:].T)
    assert rel.max() < 1e-3
    assert rel.max() < 1e-5  # actual quality; loosen only with evidence
