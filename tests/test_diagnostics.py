"""Kernel audit: golden and high-energy configs must produce healthy tables."""

import numpy as np

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models.diagnostics import audit_kernels

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


def test_audit_golden_config_healthy():
    cfg = Config(N_bins_E=50, lEmin=4.0, lEmax=9.0, non_resonant=False,
                 phiphi=False)
    p = PhysicsParams.create(5e6, 1e-6, MNTOT, 2.0, 6.0)
    rep = audit_kernels(p, cfg)
    assert rep.healthy, rep.pretty()
    assert rep.gamma_range[1] > 0


def test_audit_nonresonant_config_healthy():
    cfg = Config(N_bins_E=40, lEmin=9.0, lEmax=14.0, non_resonant=True,
                 phiphi=False, source="powerlaw")
    p = PhysicsParams.create(6e5, 0.01, 0.1, 2.5, 1.0)
    rep = audit_kernels(p, cfg)
    assert rep.healthy, rep.pretty()
    assert "HEALTHY" in rep.pretty()
