"""Cross-validation of the native C++ serial baseline against the JAX
engine: same algorithm, independent implementation, agreement must hold
to near machine precision. This is both a correctness check of the JAX
engine (independent reimplementation) and a guarantee that bench.py's
vs_baseline denominator measures the same computation."""

import io
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
SRC = ROOT / "native" / "serial_baseline.cpp"
BIN = ROOT / "native" / "serial_baseline"


@pytest.fixture(scope="module")
def baseline_bin():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not BIN.exists() or BIN.stat().st_mtime < SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-o", str(BIN), str(SRC)],
            check=True)
    return BIN


def test_cpp_matches_jax(baseline_bin):
    from nusiprop_tpu.config import Config, PhysicsParams
    from nusiprop_tpu.models.transport import evolve_core

    out = subprocess.run(
        [str(baseline_bin), "100", "4", "9", "5", "1", "--dump"],
        check=True, capture_output=True, text=True).stdout
    cpp = np.loadtxt(io.StringIO(out))

    cfg = Config(N_bins_E=100, lEmin=4, lEmax=9, zmax=5,
                 non_resonant=False, phiphi=False, source="powerlaw")
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    p = PhysicsParams.create(5e6, 1e-6, mntot, 2.0, 6.0)
    jf = np.asarray(evolve_core(p, cfg).flux_fla)

    rel = np.abs(cpp[:, 1:].T - jf) / np.maximum(np.abs(jf), 1e-300)
    assert rel.max() < 1e-12


def test_cpp_matches_jax_non_resonant(baseline_bin):
    """The C++ twin's full non-resonant channel set (native/nusi_nr.hpp:
    t/u/tu/st/su closed forms incl. the complex-dilog machinery and the
    reference's rescue/shadowing quirks) against the JAX f64 engine with
    the O(NE^2)-per-step regeneration march."""
    from nusiprop_tpu.config import Config, PhysicsParams
    from nusiprop_tpu.models.transport import evolve

    out = subprocess.run(
        [str(baseline_bin), "100", "9", "14", "5", "1", "--dump",
         "--non-resonant"],
        check=True, capture_output=True, text=True).stdout
    cpp = np.loadtxt(io.StringIO(out))

    cfg = Config(N_bins_E=100, lEmin=9, lEmax=14, zmax=5,
                 non_resonant=True, phiphi=False, source="dsnb",
                 march="trisolve", table_dtype="f64")
    mntot = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
    p = PhysicsParams.create(1e6, 1e-3, mntot, 2.0, 6.0)
    jf = np.asarray(evolve(p, cfg).flux_fla)

    pk = np.abs(jf).max()
    gate = np.abs(jf) > pk * 1e-12
    rel = np.abs(cpp[:, 1:].T - jf)[gate] / np.abs(jf)[gate]
    assert rel.max() < 1e-10
