"""Native-f32 s-channel table builders vs mpmath and the f64 builders.

The accuracy statement for kernels_f32 is made against mpmath, not the
f64 builders: far below the resonance the f64 builders' separate
pieces (Taylor/exact core + log term) cancel to O(s*d) and carry up to
~2e-4 relative noise even at DOMINANT entries (e.g. the whole
alphaTilde table at the golden point mphi=5e6, g=1e-6), while the f32
exact-integrand quadrature is uniformly ~1e-7. The f64 comparison is
kept as a loose structural check; mpmath referees disagreements.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nusiprop_tpu.models import grids, kernels, kernels_f32, masses, mixing
from nusiprop_tpu.config import Config

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))


@pytest.fixture(scope="module")
def setup():
    cfg = Config(N_bins_E=200, lEmin=4.0, lEmax=9.0, zmax=5.0,
                 non_resonant=False, phiphi=False)
    gr = grids.build(cfg)
    Wf = jnp.asarray(mixing.pmns_sq(True))[cfg.flav]
    mn = masses.mass_spectrum(MNTOT, True)
    return cfg, gr, Wf, mn


CASES = [(1e5, 1e-2), (1.6e5, 1e-2), (1e6, 1e-3), (5e6, 1e-6),
         (1e8, 1e-2), (3e7, 1e-4)]


def _f32_tables(gr, Wf, mn, g, mphi):
    G32, A32, r32, (pG, pA, pr) = kernels_f32.s_channel_tables_f32(
        gr.Emin_ext, gr.Emax_ext, mn, g, mphi, Wf, majorana=True)
    return (float(pG) * np.asarray(G32, np.float64),
            float(pA) * np.asarray(A32, np.float64),
            float(pr) * np.asarray(r32, np.float64))


@pytest.mark.parametrize("mphi,g", CASES)
def test_f32_tables_structurally_match_f64(setup, mphi, g):
    """Loose f64 comparison: bounded by the F64 builders' own ~2e-4
    cancellation noise (see module docstring); the strict gate is the
    mpmath test below."""
    cfg, gr, Wf, mn = setup
    kw = dict(majorana=True, non_resonant=False, phiphi=False)
    f64s = (np.asarray(kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn,
                                           g, mphi, Wf, **kw)),
            np.asarray(kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext,
                                                mn, g, mphi, Wf, **kw)),
            np.asarray(kernels.alpha_s_rho(gr.Emin_ext, gr.Emax_ext, mn,
                                           g, mphi, Wf, majorana=True)))
    f32s = _f32_tables(gr, Wf, mn, g, mphi)
    for nm, a, b in zip(("G", "At", "rho"), f64s, f32s):
        pk = np.abs(a).max()
        werr = np.abs(b - a).max() / pk
        assert werr < 5e-4, (nm, werr)
        m = np.abs(a) > pk * 1e-4
        rel = np.max(np.abs(b - a)[m] / np.abs(a)[m])
        assert rel < 2e-3, (nm, rel)


def _mpmath_entry(mp, table, gr, Wf, mn, g, mphi, i):
    """Reference-formula evaluation of one table entry at 60 digits.
    Gamma: nuSIprop.hpp:779-791; alphaTilde: :956-965 (with the
    near-resonance shift :949-954); both as assembled by the table
    builders (|U|^2/(2 mn) eigenstate sum)."""
    ga = mp.mpf(g) ** 2 * mp.mpf(mphi) / (16 * mp.pi)
    G2v = 1 + (ga / mp.mpf(mphi)) ** 2
    tot = mp.mpf(0)
    for j in range(3):
        mnj = mp.mpf(float(mn[j]))
        sm = 2 * mnj * mp.mpf(float(gr.Emin_ext[i])) / mp.mpf(mphi) ** 2
        sp = 2 * mnj * mp.mpf(float(gr.Emax_ext[i])) / mp.mpf(mphi) ** 2
        if table == "G":
            pref = mp.mpf(g) ** 2 / (32 * mp.pi * ga) * mp.mpf(g) ** 2
            core = 2 * mp.mpf(mphi) * (
                mp.atan(mp.mpf(mphi) * (sp - 1) / ga)
                - mp.atan(mp.mpf(mphi) * (sm - 1) / ga))
            lt = (mp.log(G2v + sp * (sp - 2)) - mp.log(G2v + sm * (sm - 2)))
            val = pref * (core + ga * lt)
        else:
            tm, tp = -sm, -sp
            if abs(float(tm) + 1.0) < 1e-7:
                tm = tm + tm * mp.mpf(1e-6)
            if abs(float(tp) + 1.0) < 1e-7:
                tp = tp + tp * mp.mpf(1e-6)
            pref = mp.mpf(g) ** 2 / (16 * mp.pi * ga) * mp.mpf(g) ** 2
            core = 2 * mp.mpf(mphi) * (1 + tm) * (
                mp.atan(mp.mpf(mphi) * (1 + tm) / ga)
                - mp.atan(mp.mpf(mphi) * (1 + tp) / ga))
            lt = (mp.log(G2v + tp * (tp + 2)) - mp.log(G2v + tm * (tm + 2)))
            val = pref * (core + ga * lt)
        tot += mp.mpf(float(Wf[j])) / (2 * mnj) * val
    return tot


@pytest.mark.parametrize("mphi,g", CASES)
@pytest.mark.parametrize("table", ["G", "At"])
def test_f32_tables_vs_mpmath(setup, mphi, g, table):
    """The real accuracy gate: sampled entries (including the table max
    and the worst f32-vs-f64 disagreement) must match a 60-digit
    evaluation of the reference formulas to ~2e-6."""
    mp = pytest.importorskip("mpmath")
    mp.mp.dps = 60
    cfg, gr, Wf, mn = setup
    kw = dict(majorana=True, non_resonant=False, phiphi=False)
    k64 = {"G": kernels.gamma_table, "At": kernels.alphatilde_table}[table]
    a = np.asarray(k64(gr.Emin_ext, gr.Emax_ext, mn, g, mphi, Wf, **kw))
    b = _f32_tables(gr, Wf, mn, g, mphi)[0 if table == "G" else 1]

    idxs = {int(np.argmax(np.abs(a))), int(np.argmax(np.abs(b - a))),
            10, len(a) // 2, len(a) - 5}
    pk = np.abs(a).max()
    for i in idxs:
        if np.abs(a[i]) < pk * 1e-8:
            continue  # sub-weight entry; relative error immaterial
        truth = float(_mpmath_entry(mp, table, gr, Wf, mn, g, mphi, i))
        rel32 = abs(b[i] - truth) / abs(truth)
        assert rel32 < 2e-6, (table, i, rel32)


def test_f32_beats_f64_in_cancellation_corner(setup):
    """At the golden point the entire alphaTilde table sits in the
    deep-cancellation regime: the f64 builder is ~2e-4 off at its PEAK
    entry while the f32 build stays ~1e-7. mpmath referees."""
    mp = pytest.importorskip("mpmath")
    mp.mp.dps = 60
    cfg, gr, Wf, mn = setup
    g, mphi = 1e-6, 5e6
    a = np.asarray(kernels.alphatilde_table(
        gr.Emin_ext, gr.Emax_ext, mn, g, mphi, Wf,
        majorana=True, non_resonant=False, phiphi=False))
    b = _f32_tables(gr, Wf, mn, g, mphi)[1]
    i = int(np.argmax(np.abs(a)))
    truth = float(_mpmath_entry(mp, "At", gr, Wf, mn, g, mphi, i))
    rel64 = abs(a[i] - truth) / abs(truth)
    rel32 = abs(b[i] - truth) / abs(truth)
    assert rel32 < 1e-6
    assert rel32 < rel64


def test_prefactors_positive_finite():
    mn = masses.mass_spectrum(MNTOT, True)
    cfg = Config(N_bins_E=50, lEmin=4.0, lEmax=9.0, zmax=5.0,
                 non_resonant=False, phiphi=False)
    gr = grids.build(cfg)
    Wf = jnp.asarray(mixing.pmns_sq(True))[cfg.flav]
    for g in (1e-9, 1e-6, 1e-2, 0.3):
        out = kernels_f32.s_channel_tables_f32(
            gr.Emin_ext, gr.Emax_ext, mn, g, 1e6, Wf, majorana=False)
        for p in out[3]:
            assert float(p) > 0 and np.isfinite(float(p))
        for t in out[:3]:
            assert bool(jnp.isfinite(t).all())
