"""High-energy astrophysical flux run with all channels on (mirrors
/root/reference/test.cpp:6-33 — the C++ driver's configuration).

Strong coupling (g = 0.01) makes the non-resonant t/u-channel and
interference contributions relevant; the power-law x star-formation-rate
source is the upstream model.

Run: python examples/run_highenergy.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import nusiprop_tpu as nu

evolver = nu.Evolver(
    mphi=6e5,        # Mediator mass [eV]
    g=0.01,          # Coupling (non-resonant channels matter here)
    mntot=0.1,       # Sum of neutrino masses [eV]
    si=2.5,          # Spectral index
    norm=6,
    majorana=True,
    non_resonant=True,
    normal_ordering=True,
    N_bins_E=100,
    lEmin=9,
    lEmax=14,
    zmax=5,
    flav=2,
    phiphi=False,
    source="powerlaw",
)

evolver.evolve()
flx = evolver.get_flux_fla()

print("#Energy[eV]  nu_e flux   nu_mu flux  nu_tau flux")
for energy, fe, fm, ft in zip(evolver.get_energies(), flx[0], flx[1], flx[2]):
    print("%.5e  %.4e  %.4e  %.4e" % (energy, fe, fm, ft))

print("# energy conservation drift:", evolver.check_energy_conservation())
