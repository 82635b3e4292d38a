"""Tests for the fused trisolve march (ops/march_tri).

The Pallas kernel itself needs TPU hardware (exercised by
tools/tpu_crosscheck --nr --pallas; evidence in CROSSCHECK_rNN.json).
These CPU tests pin the plain-JAX twin — the SAME substitution order as
the kernel — against the independently-derived trisolve_f32 march
(blocked Neumann solve), so a regression in either the shared row
builder, the Sherman-Morrison algebra, or the substitution recurrence
shows up without hardware.
"""

import jax
import numpy as np
import pytest

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config
from nusiprop_tpu.models import transport
from nusiprop_tpu.ops import march_tri

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


def _gated_rel(a, b, floor=1e-10):
    scale = np.abs(a).max(axis=(-1, -2), keepdims=True)
    gate = np.abs(a) > scale * floor
    return np.abs(b - a)[gate] / np.abs(a)[gate]


def _cfg(march, **kw):
    base = dict(N_bins_E=48, lEmin=4.0, lEmax=9.0, zmax=5.0,
                non_resonant=True, phiphi=False, march=march)
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize("majorana", [True, False])
def test_twin_matches_trisolve_f32(majorana):
    """Same rows, same tables: the sequential-substitution twin and the
    blocked-Neumann trisolve_f32 march must agree to f32 round-off."""
    params = nu.param_grid(np.geomspace(2e5, 2e6, 3), [1e-3],
                           mntot=MNTOT, si=2.0, norm=6.0)
    a = np.asarray(nu.grid_scan(
        params, _cfg("trisolve_f32", majorana=majorana)).flux_fla)
    b = np.asarray(march_tri.evolve_trisolve_fused(
        params, _cfg("trisolve_pallas", majorana=majorana),
        use_pallas=False).flux_fla)
    rel = _gated_rel(a, b)
    assert rel.max() < 5e-5, rel.max()


def test_twin_matches_f64_trisolve():
    """Physics gate: the fused-march pipeline vs the float64 closed-form
    trisolve engine (different tables AND different solver) within the
    1e-3 physical tolerance on gated bins. Needs production-resolution
    bins: the f32 GL3 quadrature table build's error scales as
    (bin width)^6 and is only valid below ~0.05 decades/bin
    (transport._use_f32_alpha gate), and the clean high-energy regime
    (coordinates O(1)) where the f64 closed forms themselves are
    trustworthy — at sub-resonance points their antiderivative
    differences are cancellation noise and not a valid referee
    (kernels_nr_f32 docstring, HIGH_E_MAJ family of
    tests/test_kernels_nr_f32.py)."""
    params = nu.param_grid([6e5], [1e-2], mntot=0.1, si=2.5, norm=1.0)
    kw = dict(N_bins_E=150, lEmin=9.0, lEmax=14.0, source="powerlaw")
    a = np.asarray(nu.grid_scan(params, _cfg("trisolve", **kw)).flux_fla)
    b = np.asarray(march_tri.evolve_trisolve_fused(
        params, _cfg("trisolve_pallas", **kw), use_pallas=False).flux_fla)
    rel = _gated_rel(a, b)
    assert rel.max() < 1e-3, rel.max()


def test_single_point_evolve_dispatch():
    """transport.evolve routes march='trisolve_pallas' through the
    batched fused entry as a batch of one."""
    from nusiprop_tpu.config import PhysicsParams

    p = PhysicsParams.create(mphi=6e5, g=1e-3, mntot=MNTOT, si=2.0,
                             norm=6.0)
    res = transport.evolve(p, _cfg("trisolve_pallas"))
    batched = march_tri.evolve_trisolve_fused(
        jax.tree.map(lambda x: x[None], p), _cfg("trisolve_pallas"))
    np.testing.assert_array_equal(np.asarray(res.flux),
                                  np.asarray(batched.flux[0]))
    assert res.flux.shape == (3, 48)
    assert np.isfinite(np.asarray(res.flux)).all()


def test_twin_with_phiphi_tables():
    """Full channel set (non_resonant + phi-phi) through the fused-march
    pipeline vs trisolve_f32, with the small pp tables."""
    from nusiprop_tpu.models import pp_tables as ppt

    tables = ppt.load_npz("data/pp_tables_small.npz")
    params = nu.param_grid([6e5], [1e-3], mntot=0.1, si=2.5, norm=1.0)
    kw = dict(lEmin=9.0, lEmax=14.0, source="powerlaw", phiphi=True,
              N_bins_E=48)
    a = np.asarray(nu.grid_scan(params, _cfg("trisolve_f32", **kw),
                                pp_tables=tables).flux_fla)
    b = np.asarray(march_tri.evolve_trisolve_fused(
        params, _cfg("trisolve_pallas", **kw), pp_tables=tables,
        use_pallas=False).flux_fla)
    rel = _gated_rel(a, b)
    assert rel.max() < 5e-5, rel.max()


def test_config_validation():
    with pytest.raises(ValueError):
        Config(N_bins_E=48, lEmin=4.0, lEmax=9.0, zmax=5.0,
               non_resonant=False, march="trisolve_pallas")
