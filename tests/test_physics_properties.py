"""End-to-end physics property tests.

These are the invariants the reference relies on informally (SURVEY.md §4):
energy conservation under self-interactions (its one quantitative
self-check, nuSIprop.hpp:339-357), and sane behavior of every
configuration toggle (ordering, Dirac/Majorana, interacting flavor).
"""

import dataclasses

import numpy as np
import pytest

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import masses, transport

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


def _flux(cfg, p):
    out = np.asarray(transport.evolve(p, cfg).flux_fla)
    assert np.isfinite(out).all()
    return out


@pytest.fixture(scope="module")
def he_cfg():
    """High-energy, strong-coupling config (reference test.cpp variant)."""
    return Config(N_bins_E=60, lEmin=9.0, lEmax=14.0, non_resonant=False,
                  phiphi=False, source="powerlaw")


@pytest.fixture(scope="module")
def he_params():
    return PhysicsParams.create(6e5, 0.01, 0.1, 2.5, 1.0)


class TestEnergyConservation:
    """Self-interactions redistribute energy between bins but must not
    create or destroy it. The absolute check_energy_conservation value
    carries an O(3%) discretization offset (finite bins vs the analytic
    free-streaming integral); the interaction-induced drift is the value
    relative to a free-streaming (g -> 0) run of the same grid."""

    def _drift(self, cfg, p):
        base = transport.check_energy_conservation(
            dataclasses.replace(p, g=p.g * 0 + 1e-9), cfg)
        full = transport.check_energy_conservation(p, cfg)
        return abs(float(full) - float(base))

    def test_schannel(self, he_cfg, he_params):
        assert self._drift(he_cfg, he_params) < 5e-3

    def test_nonresonant(self, he_cfg, he_params):
        cfg = dataclasses.replace(he_cfg, non_resonant=True)
        assert self._drift(cfg, he_params) < 2e-2


class TestToggles:
    def test_ordering_changes_flux(self, he_cfg, he_params):
        no = _flux(he_cfg, he_params)
        io = _flux(dataclasses.replace(he_cfg, normal_ordering=False),
                   he_params)
        assert not np.allclose(no, io)

    def test_io_mass_spectrum(self):
        mn = np.asarray(masses.mass_spectrum(
            np.float64(0.1), normal_ordering=False))
        # IO: m3 lightest; m1, m2 nearly degenerate and heavier
        assert mn[2] < mn[0] < mn[1]
        np.testing.assert_allclose(mn.sum(), 0.1, rtol=1e-10)
        np.testing.assert_allclose(mn[1] ** 2 - mn[2] ** 2, 2.497e-3,
                                   rtol=1e-6)

    def test_dirac_weaker_regeneration(self, he_cfg, he_params):
        """Dirac: one final state is sterile, so regeneration is halved;
        absorbed flux at low energies is regenerated less -> less total
        low-E flux than Majorana at same coupling... the width also
        halves; just require a finite, different spectrum."""
        maj = _flux(he_cfg, he_params)
        dir_ = _flux(dataclasses.replace(he_cfg, majorana=False), he_params)
        assert not np.allclose(maj, dir_)

    @pytest.mark.parametrize("flav", [0, 1])
    def test_flavor_choice(self, he_cfg, he_params, flav):
        tau = _flux(he_cfg, he_params)
        other = _flux(dataclasses.replace(he_cfg, flav=flav), he_params)
        assert not np.allclose(tau, other)

    def test_zero_coupling_free_streams(self, he_cfg, he_params):
        """g -> 0: spectrum approaches the pure source redshift integral;
        doubling g from 1e-9 to 2e-9 must change nothing to 1e-10."""
        a = _flux(he_cfg, dataclasses.replace(
            he_params, g=he_params.g * 0 + 1e-9))
        b = _flux(he_cfg, dataclasses.replace(
            he_params, g=he_params.g * 0 + 2e-9))
        np.testing.assert_allclose(a, b, rtol=1e-8)


class TestBatchConsistency:
    def test_vmap_matches_single(self, he_cfg, he_params):
        """A vmapped batch must reproduce per-point evolves exactly."""
        import jax
        import jax.numpy as jnp

        import nusiprop_tpu as nu

        mphis = np.array([3e5, 6e5, 2e6])
        batched = nu.param_grid(mphis, [0.01], mntot=0.1, si=2.5, norm=1.0)
        res = nu.grid_scan(batched, he_cfg)
        for k, mphi in enumerate(mphis):
            single = transport.evolve(
                PhysicsParams.create(mphi, 0.01, 0.1, 2.5, 1.0), he_cfg)
            np.testing.assert_allclose(np.asarray(res.flux_fla)[k],
                                       np.asarray(single.flux_fla),
                                       rtol=1e-12)
