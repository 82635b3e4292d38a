"""ctypes binding to the native (CPU) cascade engine.

``NativeEvolver`` exposes the engine compiled from
``native/nusi_engine.hpp`` (s-channel, the full non-resonant channel
set of ``nusi_nr.hpp``, and phi-phi production via ``nusi_pp.hpp``,
which consumes the same interpolation tables and precomputed spline
weights as the JAX engine) with (a subset of) the same API as the JAX
``Evolver`` — the native twin of the reference's C++ public surface
(nuSIprop.hpp:61-68, 173-174). Uses: machines without an accelerator,
independent cross-checks of the JAX engine, and the vs_baseline
measurement. The shared library is built on demand with g++ (no
pybind11/Cython needed — plain C ABI).
"""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libnusiprop_native.so"
_lib = None


def _build_lib():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
         "-o", str(_LIB_PATH), str(_NATIVE_DIR / "nusi_capi.cpp")],
        check=True, cwd=_NATIVE_DIR,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    srcs = [_NATIVE_DIR / n for n in ("nusi_capi.cpp", "nusi_engine.hpp",
                                      "nusi_nr.hpp", "nusi_pp.hpp")]
    stale = (not _LIB_PATH.exists()
             or _LIB_PATH.stat().st_mtime < max(s.stat().st_mtime
                                                for s in srcs))
    if stale:
        _build_lib()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.nusi_create.restype = ctypes.c_void_p
    lib.nusi_create.argtypes = [ctypes.c_int, ctypes.c_double,
                                ctypes.c_double, ctypes.c_double,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int]
    lib.nusi_set_params.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 5
    lib.nusi_set_non_resonant.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.nusi_set_phiphi.argtypes = [ctypes.c_void_p, ctypes.c_int]
    iptr = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    fptr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.nusi_set_pp_table.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int, iptr, iptr, fptr, fptr,
                                      fptr]
    lib.nusi_evolve.argtypes = [ctypes.c_void_p]
    lib.nusi_n_bins.argtypes = [ctypes.c_void_p]
    lib.nusi_n_bins.restype = ctypes.c_int
    lib.nusi_n_steps_z.argtypes = [ctypes.c_void_p]
    lib.nusi_n_steps_z.restype = ctypes.c_int
    dptr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    for name in ("nusi_get_energies", "nusi_get_flux", "nusi_get_flux_fla"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p, dptr]
    lib.nusi_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeEvolver:
    """CPU-native evolver: s-channel, non-resonant, and phi-phi channels.

    Same constructor vocabulary as ``Evolver``.
    """

    def __init__(self, mphi, g, mntot, si, norm=1.0, majorana=True,
                 non_resonant=False, normal_ordering=True, N_bins_E=300,
                 lEmin=12.0, lEmax=17.0, zmax=5.0, flav=2, phiphi=False,
                 source="dsnb"):
        if source not in ("dsnb", "powerlaw"):
            raise ValueError(f"unknown source {source!r}")
        from nusiprop_tpu.config import Config

        self._config = Config(
            majorana=bool(majorana), non_resonant=bool(non_resonant),
            normal_ordering=bool(normal_ordering), N_bins_E=int(N_bins_E),
            lEmin=float(lEmin), lEmax=float(lEmax), zmax=float(zmax),
            flav=int(flav), phiphi=bool(phiphi), source=source)
        self._lib = _load()
        self._h = self._lib.nusi_create(
            int(N_bins_E), float(lEmin), float(lEmax), float(zmax),
            int(flav), int(bool(majorana)), int(bool(normal_ordering)),
            int(source == "dsnb"))
        if non_resonant:
            self._lib.nusi_set_non_resonant(self._h, 1)
        if phiphi:
            self._lib.nusi_set_phiphi(self._h, 1)
        if phiphi and non_resonant:
            # the same tables (and precomputed spline weight tensors) the
            # JAX engine uses, marshalled once; like the reference, load
            # only when the channel is active (nuSIprop.hpp:59, 166-170)
            from nusiprop_tpu.models import pp_tables

            ppt = pp_tables.load_default()
            self._push_pp_table(0, ppt.alphatilde)
            self._push_pp_table(1, ppt.alpha)
        self._n = int(N_bins_E)
        self.set_parameters(mphi=mphi, g=g, mntot=mntot, si=si, norm=norm)
        self.evolved = False

    def _push_pp_table(self, which, spl):
        ns = np.array([n.shape[0] for n in spl.nodes], dtype=np.int32)
        logax = np.array([int(b) for b in spl.log_axes], dtype=np.int32)
        nodes = np.concatenate(
            [np.asarray(n, dtype=np.float64) for n in spl.nodes])
        weights = np.concatenate(
            [np.asarray(w, dtype=np.float64).ravel() for w in spl.weights])
        values = np.ascontiguousarray(
            np.asarray(spl.values, dtype=np.float64).ravel())
        self._lib.nusi_set_pp_table(self._h, int(which), len(ns), ns, logax,
                                    nodes, weights, values)

    def set_parameters(self, mphi=None, g=None, mntot=None, si=None,
                       norm=None):
        cur = getattr(self, "_params", dict(mphi=0.0, g=0.0, mntot=0.0,
                                            si=2.0, norm=1.0))
        upd = dict(mphi=mphi, g=g, mntot=mntot, si=si, norm=norm)
        cur.update({k: float(v) for k, v in upd.items() if v is not None})
        self._params = cur
        self._lib.nusi_set_params(self._h, cur["mphi"], cur["g"],
                                  cur["mntot"], cur["si"], cur["norm"])
        self.evolved = False

    def evolve(self):
        self._lib.nusi_evolve(self._h)
        self.evolved = True
        return self

    def get_N_bins_E(self):
        return self._n

    def get_energies(self):
        out = np.empty(self._n, dtype=np.float64)
        self._lib.nusi_get_energies(self._h, out)
        return out

    def _get(self, fn):
        if not self.evolved:
            import warnings

            warnings.warn("You have not evolved the neutrino flux! "
                          "Zero flux will be returned.")
            return np.zeros((3, self._n))
        out = np.empty(3 * self._n, dtype=np.float64)
        fn(self._h, out)
        return out.reshape(3, self._n)

    def get_flux(self):
        return self._get(self._lib.nusi_get_flux)

    def get_flux_fla(self):
        return self._get(self._lib.nusi_get_flux_fla)

    def check_energy_conservation(self):
        """(E_int - E_FS)/E_FS; evolves as a side effect, one evolve per
        call. Like the reference fork, E_FS uses the power-law source
        forms regardless of the active source (nuSIprop.hpp:339-357)."""
        from nusiprop_tpu.models import grids, sources

        gr = grids.build(self._config)
        si, norm = self._params["si"], self._params["norm"]
        norm_total = norm / float(sources.flux_fs_e0(si, gr.zmax_eff))
        E_FS = float(sources.energy_fs(self._config.lEmin,
                                       self._config.lEmax, si, norm_total,
                                       gr.zmax_eff))
        self.evolve()
        flux = self.get_flux()
        logw = np.log(np.asarray(gr.Emax)) - np.log(np.asarray(gr.Emin))
        E_int = float(np.sum(logw[None, :] * np.asarray(gr.E_nu)[None, :] ** 2
                             * flux))
        return (E_int - E_FS) / E_FS

    def _interp_flux(self, row, energy):
        E = self.get_energies()
        fla = self.get_flux_fla()[row]
        si = self._params["si"]
        energy = np.asarray(energy)
        if np.any(energy < E[0]) or np.any(energy > E[-1]):
            raise ValueError(
                f"energy outside the interpolation range "
                f"[{E[0]:.6g}, {E[-1]:.6g}] eV")
        return np.interp(np.log10(energy), np.log10(E),
                         fla * E ** si) / energy ** si

    def interp_flux_el(self, energy):
        return self._interp_flux(0, energy)

    def interp_flux_mu(self, energy):
        return self._interp_flux(1, energy)

    def interp_flux_ta(self, energy):
        return self._interp_flux(2, energy)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and self._lib is not None:
            try:
                self._lib.nusi_destroy(h)
            except (OSError, AttributeError):  # interpreter teardown
                pass
            self._h = None
