"""Measure whether _NPANEL can be trimmed from the production value of
3 (kernels_nr_f32._NPANEL) to 2 in the f32 non-resonant alpha build
without leaving the f32-round-off-bound regime.

Method: for each configuration family, build the f32 alpha table at
_NPANEL in {5, 3, 2, 1} and compare (a) against _NPANEL=5 as the
self-convergence reference, (b) against the f64 closed forms in the
clean high-energy regime where those are trustworthy. If 2 panels sit
at the same error as 3 (both round-off bound), the build is over-
resolved and a 3->2 trim drops ~1/3 of the per-segment q-nodes.

NOTE: the monkeypatch of the private _NPANEL global below works only
because alpha_table_f32 is un-jitted; if it ever gains a jit/cache the
patch would silently freeze the first value.

Run on CPU: python tools/experiment_npanel.py
"""

import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax.numpy as jnp  # noqa: E402

from nusiprop_tpu.config import Config  # noqa: E402
from nusiprop_tpu.models import (grids, kernels, kernels_nr_f32,  # noqa: E402
                                 masses, mixing)

MNTOT = float(np.sqrt(7.42e-5) + np.sqrt(2.514e-3))
CASES = {
    "highE-maj (clean, vs f64)": (6e5, 1e-2, True, 150, 9.0, 14.0, 0.1),
    "golden-nr (sub-res)": (5e6, 1e-3, True, 150, 4.0, 9.0, MNTOT),
    "strong-sub (f64-noise)": (1e6, 1e-2, True, 150, 4.0, 9.0, MNTOT),
}


def build(gr, Wf, mn, g, mphi, maj, npanel):
    old = kernels_nr_f32._NPANEL
    kernels_nr_f32._NPANEL = npanel
    try:
        return np.asarray(kernels_nr_f32.alpha_table_f32(
            gr.Emin_ext, gr.Emax_ext, mn, g, mphi, Wf, majorana=maj))
    finally:
        kernels_nr_f32._NPANEL = old


def main():
    for name, (mphi, g, maj, nb, lo, hi, mntot) in CASES.items():
        cfg = Config(N_bins_E=nb, lEmin=lo, lEmax=hi, non_resonant=True,
                     phiphi=False, majorana=maj,
                     source="powerlaw" if lo > 8 else "dsnb")
        gr = grids.build(cfg)
        Wf = jnp.asarray(mixing.pmns_sq(True))[cfg.flav]
        mn = masses.mass_spectrum(mntot, True)
        ref = build(gr, Wf, mn, g, mphi, maj, 5)
        pk = np.abs(ref).max()
        gate = np.abs(ref) > pk * 1e-8
        a64 = np.asarray(kernels.alpha_table(
            gr.Emin_ext, gr.Emax_ext, mn, g, mphi, Wf,
            majorana=maj, non_resonant=True, phiphi=False))
        g64 = np.abs(a64) > np.abs(a64).max() * 1e-6
        print(f"== {name}")
        for npanel in (3, 2, 1):
            a = build(gr, Wf, mn, g, mphi, maj, npanel)
            rel5 = np.max(np.abs(a - ref)[gate] / np.abs(ref)[gate])
            rel64 = np.max(np.abs(a - a64)[g64] / np.abs(a64)[g64])
            print(f"  npanel={npanel}: vs npanel5 {rel5:.3e}   "
                  f"vs f64 closed forms (their gate) {rel64:.3e}")


if __name__ == "__main__":
    main()
