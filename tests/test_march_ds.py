"""Fused double-single march (ops/march_ds.py) vs the f64 engine.

The ds march must agree with transport.evolve on every bin that is
representable in the f32 exponent envelope (the same envelope TPU f64
emulation has); the physical gate is 1e-3 (golden), these hold ~1e-6.
Pallas kernel exercised in interpreter mode (semantics identical to the
Mosaic lowering); real-TPU timing happens in the bench.
"""

import jax
import numpy as np
import pytest

import nusiprop_tpu as nu
from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import transport
from nusiprop_tpu.ops.march_ds import evolve_pallas, march_ds

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


def _compare(got, ref, tol):
    mask = np.abs(ref) > np.abs(ref).max() * 1e-25
    rel = np.abs(got - ref)[mask] / np.abs(ref)[mask]
    assert rel.max() < tol, rel.max()


def test_golden_config():
    cfg = Config(N_bins_E=100, lEmin=4.0, lEmax=9.0, non_resonant=False,
                 phiphi=False)
    p = PhysicsParams.create(5e6, 1e-6, MNTOT, 2.0, 6.0)
    got = np.asarray(march_ds(p, cfg))
    ref = np.asarray(transport.evolve(p, cfg).flux_fla)
    _compare(got, ref, 1e-6)


def test_strong_coupling():
    """Regeneration-dominated regime — exercises the rescaled c/d path
    (raw weights sit at ~1e-37, the f32 exponent floor)."""
    cfg = Config(N_bins_E=80, lEmin=9.0, lEmax=14.0, non_resonant=False,
                 phiphi=False, source="powerlaw")
    p = PhysicsParams.create(3e5, 0.02, 0.1, 2.5, 1.0)
    got = np.asarray(march_ds(p, cfg))
    ref = np.asarray(transport.evolve(p, cfg).flux_fla)
    _compare(got, ref, 1e-5)


def test_pallas_interpret_batched():
    cfg = Config(N_bins_E=64, lEmin=4.0, lEmax=9.0, non_resonant=False,
                 phiphi=False)
    params = nu.param_grid(np.geomspace(1e5, 1e8, 3), [1e-2],
                           mntot=MNTOT, si=2.0, norm=6.0)
    got = np.asarray(evolve_pallas(params, cfg, interpret=True))
    for k in range(3):
        p = jax.tree.map(lambda x: x[k], params)
        ref = np.asarray(transport.evolve(p, cfg).flux_fla)
        _compare(got[k], ref, 1e-5)


def test_rejects_nonresonant():
    cfg = Config(N_bins_E=16, lEmin=4.0, lEmax=9.0, non_resonant=True,
                 phiphi=False)
    p = PhysicsParams.create(5e6, 1e-6, MNTOT, 2.0, 6.0)
    with pytest.raises(ValueError, match="s-channel"):
        march_ds(p, cfg)
