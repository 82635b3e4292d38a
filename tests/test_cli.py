"""CLI driver (`python -m nusiprop_tpu`) — plumbing and parity.

The reference's entry points are the hard-coded test.py / test.cpp
drivers (SURVEY.md C23); the CLI exposes the same construct → evolve →
savetxt workflow behind flags. These tests run main() in-process (the
conftest already pins the CPU backend) on small grids.
"""

import numpy as np
import pytest

from nusiprop_tpu.__main__ import _resolve_mntot, main
from nusiprop_tpu import constants as c
from nusiprop_tpu.utils import io as nio


def test_massless_keyword_matches_testpy():
    # test.py:13 — mntot = sqrt(dm21) + sqrt(dm31) for massless m1 (NO)
    assert _resolve_mntot("massless", True) == pytest.approx(
        np.sqrt(c.DMQ21) + np.sqrt(c.DMQ31_NO), rel=1e-15)
    # IO: m3 = 0 -> m2 = sqrt(-dm32), m1 = sqrt(-dm32 - dm21)
    io_sum = _resolve_mntot("massless", False)
    m2 = np.sqrt(-c.DMQ32_IO)
    m1 = np.sqrt(-c.DMQ32_IO - c.DMQ21)
    assert io_sum == pytest.approx(m1 + m2, rel=1e-15)
    assert _resolve_mntot("0.1", True) == 0.1


def test_cli_writes_reference_format_spectrum(tmp_path):
    out = tmp_path / "spec.txt"
    rc = main([
        "--mphi", "5e6", "--g", "1e-6", "--mntot", "massless",
        "--si", "2", "--norm", "6", "--bins", "40",
        "--lEmin", "4", "--lEmax", "9", "--flav", "2",
        "--s-channel-only", "--no-phiphi", "-q",
        "-o", str(out),
    ])
    assert rc == 0
    E, fla = nio.load_spectrum(out)
    assert E.shape == (40,) and fla.shape == (3, 40)
    assert np.all(np.isfinite(fla)) and np.all(fla >= 0)

    # Same configuration through the library gives the same spectrum
    # (up to the %.4e text round-trip of the reference format).
    import nusiprop_tpu as nu

    ev = nu.Evolver(mphi=5e6, g=1e-6,
                    mntot=_resolve_mntot("massless", True),
                    si=2.0, norm=6, N_bins_E=40, lEmin=4, lEmax=9,
                    flav=2, non_resonant=False, phiphi=False)
    ev.evolve()
    ref = ev.get_flux_fla()
    scale = np.max(np.abs(ref))
    assert np.allclose(fla, ref, atol=1e-3 * scale, rtol=1e-3)


def test_cli_check_energy_and_march_override(tmp_path, capsys):
    rc = main([
        "--mphi", "5e6", "--g", "1e-6", "--mntot", "0.06",
        "--si", "2", "--bins", "32", "--lEmin", "4", "--lEmax", "9",
        "--s-channel-only", "--no-phiphi", "--march", "loop",
        "--check-energy",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "march=loop" in out
    assert "energy-conservation drift" in out


def test_cli_scan_grid(tmp_path):
    from nusiprop_tpu.__main__ import _parse_axis

    assert np.allclose(_parse_axis("1e2:1e4:3"), [1e2, 1e3, 1e4])
    assert np.allclose(_parse_axis("5e3,2e6"), [5e3, 2e6])
    with pytest.raises(SystemExit):
        _parse_axis("-1,3")

    out = tmp_path / "scan.npz"
    rc = main([
        "scan", "--mphi", "1e6:1e7:3", "--g", "1e-6,1e-5",
        "--mntot", "0.06", "--si", "2", "--bins", "24",
        "--lEmin", "4", "--lEmax", "9",
        "--s-channel-only", "--no-phiphi", "--chunk", "4",
        "-q", "-o", str(out),
    ])
    assert rc == 0
    dat = np.load(out)
    assert dat["flux_fla"].shape == (6, 3, 24)
    assert dat["E_nu"].shape == (24,)
    assert dat["mphi"].shape == (3,) and dat["g"].shape == (2,)
    assert np.all(np.isfinite(dat["flux_fla"]))

    # checkpointed mode reproduces the plain scan
    out2 = tmp_path / "scan_ck.npz"
    rc = main([
        "scan", "--mphi", "1e6:1e7:3", "--g", "1e-6,1e-5",
        "--mntot", "0.06", "--si", "2", "--bins", "24",
        "--lEmin", "4", "--lEmax", "9",
        "--s-channel-only", "--no-phiphi", "--chunk", "4",
        "--checkpoint", "-q", "-o", str(out2),
    ])
    assert rc == 0
    dat2 = np.load(out2)
    np.testing.assert_allclose(dat2["flux_fla"], dat["flux_fla"],
                               rtol=1e-12)


def test_cli_rejects_bad_flav():
    with pytest.raises(SystemExit):
        main(["--mphi", "1", "--g", "1", "--mntot", "0.1", "--si", "2",
              "--flav", "7"])
