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


def test_evolve_audit_screams_on_pathological_config(capsys):
    """Opt-in runtime surfacing of the reference's negative-cross-
    section stderr dumps (nuSIprop.hpp:909-918, 1215-1231): a config
    whose f64 closed forms go negative past the rescues must warn
    during a normal evolve(audit=True)."""
    import nusiprop_tpu as nu

    ev = nu.Evolver(mphi=1e6, g=1e-2, mntot=MNTOT, si=2.0, norm=6.0,
                    N_bins_E=60, lEmin=4, lEmax=9, non_resonant=True,
                    phiphi=False)
    ev.evolve(audit=True)
    err = capsys.readouterr().err
    assert "Negative cross section" in err
    assert "Possible roundoff errors for g=0.01" in err
    assert ev.last_audit is not None and not ev.last_audit.healthy


def test_evolve_audit_quiet_on_healthy_config(capsys):
    import nusiprop_tpu as nu

    ev = nu.Evolver(mphi=5e6, g=1e-6, mntot=MNTOT, si=2.0, norm=6.0,
                    N_bins_E=50, lEmin=4, lEmax=9, non_resonant=False,
                    phiphi=False)
    ev.evolve(audit=True)
    assert capsys.readouterr().err == ""
    assert ev.last_audit.healthy


def test_cli_audit_flag(capsys, tmp_path):
    from nusiprop_tpu.__main__ import main

    rc = main(["evolve", "--mphi", "1e6", "--g", "1e-2", "--mntot", str(MNTOT),
               "--si", "2.0", "--norm", "6.0", "--bins", "60",
               "--lEmin", "4", "--lEmax", "9", "--s-channel-only",
               "--audit", "--cpu", "-q",
               "-o", str(tmp_path / "out.txt")])
    assert rc == 0
