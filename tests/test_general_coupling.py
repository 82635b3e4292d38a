"""Non-diagonal flavor-space interactions (BASELINE.json config 5).

evolve_general takes an arbitrary mass-basis coupling-squared matrix
Q_ij = |g_ij|^2 / g^2. Exactness anchors:
  * Q = w w^T (w = |U[flav]|^2) must reproduce the flavor-diagonal
    engine bit-for-bit physics (same implicit march, same kernels);
  * the exact rescaling invariance g -> sqrt(c) g  <=>  Q -> c Q pins
    the vertex-power bookkeeping (each process carries |g_prod|^2 x
    sum-over-decay |g|^2 and the width scales with sum Q);
  * a democratic texture must still conserve energy under transport.
"""

import dataclasses

import numpy as np
import pytest

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import mixing, transport


@pytest.fixture(scope="module")
def cfg():
    return Config(N_bins_E=48, lEmin=9.0, lEmax=14.0, non_resonant=False,
                  phiphi=False, source="powerlaw")


@pytest.fixture(scope="module")
def params():
    return PhysicsParams.create(6e5, 0.01, 0.1, 2.5, 1.0)


def _rel(a, b):
    scale = np.maximum(np.abs(a), np.abs(b))
    return np.max(np.abs(a - b) / np.where(scale > 0, scale, 1.0))


def test_diagonal_q_matches_evolve(cfg, params):
    w = np.asarray(mixing.pmns_sq(True))[cfg.flav]
    Q = np.outer(w, w)
    gen = np.asarray(transport.evolve_general(params, Q, cfg).flux_fla)
    ref = np.asarray(transport.evolve(params, cfg).flux_fla)
    assert _rel(gen, ref) < 1e-10


def test_flavor_texture_helper_matches_projector():
    for no in (True, False):
        for f in range(3):
            G = np.zeros((3, 3))
            G[f, f] = 1.0
            Q = mixing.flavor_coupling_to_Q(G, normal_ordering=no)
            w = np.asarray(mixing.pmns_sq(no))[f]
            np.testing.assert_allclose(Q, np.outer(w, w), rtol=1e-12,
                                       atol=1e-15)


def test_rescaling_invariance(cfg, params):
    """g -> sqrt(c) g with Q is identical to g with c Q."""
    Q = np.array([[0.2, 0.1, 0.05],
                  [0.1, 0.3, 0.15],
                  [0.05, 0.15, 0.4]])
    c = 4.0
    a = transport.evolve_general(
        dataclasses.replace(params, g=params.g * np.sqrt(c)), Q, cfg)
    b = transport.evolve_general(params, c * Q, cfg)
    assert _rel(np.asarray(a.flux_fla), np.asarray(b.flux_fla)) < 1e-12


def test_democratic_texture_finite_and_conserves(cfg, params):
    Q = np.full((3, 3), 1.0 / 9.0)
    res = transport.evolve_general(params, Q, cfg)
    flx = np.asarray(res.flux_fla)
    assert np.isfinite(flx).all() and (flx > 0).all()

    # energy conservation: interaction-induced drift vs a g->0 run
    logw = np.log(np.asarray(res.Emax)) - np.log(np.asarray(res.Emin))
    E = np.asarray(res.E_nu)

    def total_energy(r):
        return float(np.sum(logw[None, :] * E[None, :] ** 2
                            * np.asarray(r.flux)))

    free = transport.evolve_general(
        dataclasses.replace(params, g=params.g * 0 + 1e-9), Q, cfg)
    drift = abs(total_energy(res) - total_energy(free)) / total_energy(free)
    assert drift < 5e-3


def test_q_validation(cfg, params):
    with pytest.raises(ValueError):
        transport.evolve_general(params, np.ones((2, 2)), cfg)
    with pytest.raises(ValueError):
        mixing.flavor_coupling_to_Q(np.ones((4, 3)))


def test_evolver_coupling_matrix(cfg, params):
    import nusiprop_tpu as nu

    Q = np.full((3, 3), 1.0 / 9.0)
    ev = nu.Evolver(mphi=6e5, g=0.01, mntot=0.1, si=2.5, norm=1.0,
                    N_bins_E=48, lEmin=9, lEmax=14, non_resonant=False,
                    phiphi=False, source="powerlaw", coupling_matrix=Q)
    ev.evolve()
    ref = np.asarray(transport.evolve_general(params, Q, cfg).flux_fla)
    np.testing.assert_allclose(ev.get_flux_fla(), ref, rtol=1e-13)
