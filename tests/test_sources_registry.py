"""Generalized source registry: custom redshift evolution / spectra
plug into the engine and inherit batching (BASELINE.json config 5)."""

import jax.numpy as jnp
import numpy as np
import pytest

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import sources, transport

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


def _flat_burst(z, Em, Ep, si, norm_total):
    """Toy source: flat dN/dE, (1+z)^-3 evolution (non-SFR)."""
    return (Ep - Em) * (1.0 + z) ** (-3.0) * 1e-20


sources.register_source("flat_burst", _flat_burst)


def test_registry_rejects_bad():
    with pytest.raises(ValueError):
        sources.register_source("dsnb", _flat_burst)
    with pytest.raises(TypeError):
        sources.register_source("x", 42)
    with pytest.raises(KeyError):
        sources.lum("nope", 0.1, jnp.ones(3), jnp.ones(3), 2.0, 1.0)
    with pytest.raises(ValueError, match="unknown source"):
        Config(source="unregistered-name")


def test_custom_source_end_to_end():
    cfg = Config(N_bins_E=32, lEmin=4.0, lEmax=9.0, non_resonant=False,
                 phiphi=False, source="flat_burst")
    p = PhysicsParams.create(5e6, 1e-6, MNTOT, 2.0, 6.0)
    res = transport.evolve(p, cfg)
    flx = np.asarray(res.flux_fla)
    assert np.isfinite(flx).all() and (flx > 0).all()

    # a weaker source must scale the flux linearly (transport is linear
    # in the source at fixed kernels)
    sources.register_source("flat_burst_half",
                            lambda z, Em, Ep, si, n: _flat_burst(
                                z, Em, Ep, si, n) * 0.5)
    import dataclasses

    res2 = transport.evolve(
        p, dataclasses.replace(cfg, source="flat_burst_half"))
    np.testing.assert_allclose(np.asarray(res2.flux_fla), flx * 0.5,
                               rtol=1e-12)


def test_custom_source_batches():
    cfg = Config(N_bins_E=24, lEmin=4.0, lEmax=9.0, non_resonant=False,
                 phiphi=False, source="flat_burst")
    params = nu.param_grid(np.geomspace(1e5, 1e8, 4), [1e-6],
                           mntot=MNTOT, si=2.0, norm=6.0)
    res = nu.grid_scan(params, cfg)
    assert np.isfinite(np.asarray(res.flux_fla)).all()


@pytest.mark.parametrize("name,si,nt", [("dsnb", 2.0, 7.3e5),
                                        ("powerlaw", 2.5, 1.1e4)])
def test_lum_rows_extended_matches_per_node(name, si, nt):
    """The edge-ladder factorization (one antiderivative eval per
    extended edge) must reproduce the per-(node, bin) evaluation. The
    dsnb tolerance reflects mutual cancellation noise: both paths
    subtract near-equal antiderivative values at the lowest-energy bins
    (the reference's own subtraction at nuSIprop.hpp:659-662 carries the
    same ~1e-7 noise)."""
    import jax

    from nusiprop_tpu.models import grids

    cfg = Config(N_bins_E=100, lEmin=4.0, lEmax=9.0, zmax=5.0,
                 non_resonant=False, phiphi=False, source=name)
    gr = grids.build(cfg)
    NE, Nz = cfg.N_bins_E, gr.N_steps_z
    steps = jnp.arange(Nz - 1, 0, -1)
    zi = gr.z[steps]
    idx = (steps - 1)[:, None] + jnp.arange(NE)[None, :]
    kk = jnp.arange(NE + Nz, dtype=jnp.float64)
    edges = 10.0 ** (cfg.lEmin + (cfg.lEmax - cfg.lEmin) * kk / NE)
    fast = np.asarray(sources.lum_rows_extended(name, edges, zi, idx + 1,
                                                si, nt))
    slow = np.asarray(jax.vmap(
        lambda zz: sources.lum(name, zz, gr.Emin, gr.Emax, si, nt))(zi))
    m = np.abs(slow) > np.abs(slow).max() * 1e-280
    rel = np.max(np.abs(fast - slow)[m] / np.abs(slow)[m])
    assert rel < 5e-6, rel


def test_lum_rows_extended_declines_custom():
    assert sources.lum_rows_extended(
        "flat_burst", jnp.ones(8), jnp.ones(3), jnp.zeros((3, 4), int),
        2.0, 1.0) is None
