"""User-facing API mirroring the reference Python wrapper.

``Evolver`` (alias ``pyprop``) replicates the constructor signature,
methods and behavioral quirks of the reference Cython class
(nuSIprop.pyx:12-144): the un-evolved-flux warning, the
``set_parameters`` reset, and the power-law-flattened log-energy
interpolators. Unlike the reference it is a thin stateful veneer over the
pure-functional engine — all heavy lifting is jitted JAX, compiled once
per static configuration and reusable across parameter updates.
"""

import warnings

import numpy as np

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import transport
from nusiprop_tpu.models.transport import EvolveResult


class Evolver:
    """Evolves an astrophysical neutrino flux with scalar self-interactions.

    Mandatory parameters:
      mphi   ---- Mediator mass [eV]
      g      ---- Yukawa coupling (Lagrangian -(1/2) g psi-bar psi phi)
      mntot  ---- Sum of neutrino masses [eV]
      si     ---- Spectral index of the injected power-law flux

    Optional parameters (defaults follow the reference Python wrapper,
    nuSIprop.pyx:47-52):
      norm            ---- Free-streaming flux normalization at 100 TeV [1]
      majorana        ---- Majorana (True) vs Dirac (False) [True]
      non_resonant    ---- Include non-s-channel contributions [True]
      normal_ordering ---- Normal (True) vs inverted (False) ordering [True]
      N_bins_E        ---- Number of log-uniform energy bins [300]
      lEmin, lEmax    ---- log10 of the energy range bounds /eV [12, 17]
      zmax            ---- Largest source redshift [5]
      flav            ---- Flavor of interacting neutrinos 0=e 1=mu 2=tau [2]
      phiphi          ---- Include double-scalar production [True]
      source          ---- "dsnb" (reference-fork default), "powerlaw",
                           or any name added via register_source [dsnb]
      coupling_matrix ---- optional (3, 3) mass-basis |g_ij|^2/g^2 for
                           non-diagonal flavor structures (overrides
                           ``flav``; see flavor_coupling_to_Q) [None]
      extrapolation   ---- phi-phi table out-of-range policy: "clamp"
                           (engine default) or "raise" (reference-
                           strict: evolve() fails like the reference's
                           exit(1), interp.hpp:354-361) [clamp]
    """

    def __init__(self, mphi, g, mntot, si, norm=1.0,
                 majorana=True, non_resonant=True, normal_ordering=True,
                 N_bins_E=300, lEmin=12.0, lEmax=17.0,
                 zmax=5.0, flav=2, phiphi=True, source="dsnb",
                 coupling_matrix=None, extrapolation="clamp"):
        self.config = Config(
            majorana=bool(majorana),
            non_resonant=bool(non_resonant),
            normal_ordering=bool(normal_ordering),
            N_bins_E=int(N_bins_E),
            lEmin=float(lEmin),
            lEmax=float(lEmax),
            zmax=float(zmax),
            flav=int(flav),
            phiphi=bool(phiphi),
            source=source,
            extrapolation=extrapolation,
        )
        self.params = PhysicsParams.create(mphi, g, mntot, si, norm)
        # Optional mass-basis coupling-squared matrix Q_ij = |g_ij|^2/g^2
        # (non-diagonal flavor structures; see transport.evolve_general
        # and mixing.flavor_coupling_to_Q). None = the reference's
        # flavor-diagonal interaction picked by `flav`.
        self.coupling_matrix = (None if coupling_matrix is None
                                else np.asarray(coupling_matrix,
                                                dtype=np.float64))
        # Load interpolation tables only when needed, like the reference
        # ("for speed reasons", nuSIprop.hpp:59, 166-170).
        self._pp_tables = None
        if self.config.phiphi and self.config.non_resonant:
            from nusiprop_tpu.models import pp_tables

            self._pp_tables = pp_tables.load_default()
        self.evolved = False
        self.last_audit = None
        self._result: EvolveResult | None = None

    # -- parameter access (mirrors the public fields mphi,g,mntot,si,norm) --

    def set_parameters(self, mphi=None, g=None, mntot=None, si=None,
                       norm=None):
        """Modify the physics parameters; invalidates the evolved flux."""
        kw = dict(mphi=mphi, g=g, mntot=mntot, si=si, norm=norm)
        updates = {k: v for k, v in kw.items() if v is not None}
        if updates:
            current = dict(
                mphi=self.params.mphi, g=self.params.g,
                mntot=self.params.mntot, si=self.params.si,
                norm=self.params.norm,
            )
            current.update(updates)
            self.params = PhysicsParams.create(**current)
        self.evolved = False

    @property
    def mphi(self):
        return float(self.params.mphi)

    @mphi.setter
    def mphi(self, v):
        self.set_parameters(mphi=v)

    @property
    def g(self):
        return float(self.params.g)

    @g.setter
    def g(self, v):
        self.set_parameters(g=v)

    @property
    def mntot(self):
        return float(self.params.mntot)

    @mntot.setter
    def mntot(self, v):
        self.set_parameters(mntot=v)

    @property
    def si(self):
        return float(self.params.si)

    @si.setter
    def si(self, v):
        self.set_parameters(si=v)

    @property
    def norm(self):
        return float(self.params.norm)

    @norm.setter
    def norm(self, v):
        self.set_parameters(norm=v)

    # -- main entry points ---------------------------------------------------

    def evolve(self, audit=False):
        """Evolve the neutrino flux.

        ``audit=True`` additionally builds the f64 kernel tables through
        the diagnostics path and screams to stderr with a parameter dump
        if any final entry is negative or non-finite — the runtime
        analog of the reference's always-on negative-cross-section
        checks (nuSIprop.hpp:909-918, 1215-1231, 1505-1516). Off by
        default: the reference's checks ride along per scalar kernel
        call for free, whereas here they would be a second table build,
        so the hot path stays untouched. The report is kept on
        ``self.last_audit``.
        """
        if self.coupling_matrix is not None:
            self._result = transport.evolve_general(
                self.params, self.coupling_matrix, self.config,
                pp_tables=self._pp_tables)
        else:
            self._result = transport.evolve(self.params, self.config,
                                            pp_tables=self._pp_tables)
        self.evolved = True
        self._check_health()
        if audit:
            self.audit()
        return self

    # relative negativity the reference tolerates as roundoff before
    # screaming (its channel checks divide by (g/mphi)^4 and compare to
    # -1e-11, nuSIprop.hpp:1215-1231)
    _HEALTH_TOL = -1e-11
    # free-streaming gate: below this per-z-step interaction depth
    # (transport._march_tau) the tables cannot move the flux at all, so
    # negativity is guaranteed round-off noise — the analog of the
    # reference normalizing its checks by the channel scale (g/mphi)^4
    # instead of the table's own (possibly pure-noise) magnitude.
    _HEALTH_TAU_FLOOR = 1e-10

    def _check_health(self):
        """Default-on cheap health check: three scalars computed from
        the tables the evolve already built (EvolveResult.health),
        warned here on the host — the always-on analog of the
        reference's per-kernel-call negative-cross-section stderr dumps
        (nuSIprop.hpp:909-918, 1215-1231, 1505-1516) without a second
        table build. The full per-channel report remains
        ``evolve(audit=True)`` / ``audit()``."""
        import sys

        h = getattr(self._result, "health", None)
        if h is None:
            return
        h = np.asarray(h, dtype=np.float64)
        worst, nonfinite = float(h[0]), float(h[1])
        tau = float(h[2]) if h.shape[-1] > 2 else np.inf
        dynamically_relevant = tau > self._HEALTH_TAU_FLOOR
        if nonfinite > 0 or (worst < self._HEALTH_TOL
                             and dynamically_relevant):
            sys.stderr.write(
                "Negative cross section in the kernel tables (worst "
                f"relative entry {worst:.3e}; {int(nonfinite)} non-finite "
                "entries).\n"
                f"Possible roundoff errors for g={self.g}, "
                f"mphi={self.mphi}, mntot={self.mntot}\n"
                "Run evolve(audit=True) for the per-channel report.\n")

    def audit(self):
        """Build the kernel tables and warn on stderr if unhealthy.

        Returns the models.diagnostics.KernelAudit report (also kept on
        ``self.last_audit``)."""
        import sys

        from nusiprop_tpu.models import diagnostics

        report = diagnostics.audit_kernels(self.params, self.config,
                                           pp_tables=self._pp_tables)
        self.last_audit = report
        if not report.healthy:
            sys.stderr.write(
                "Negative cross section in the kernel tables (even after "
                "the quadrature rescues). The table health is as "
                "follows:\n" + report.pretty() + "\n"
                f"Possible roundoff errors for g={self.g}, "
                f"mphi={self.mphi}, mntot={self.mntot}\n")
        return report

    def _require_evolved(self):
        if not self.evolved or self._result is None:
            warnings.warn(
                "You have not evolved the neutrino flux! Zero flux will be returned."
            )
            return False
        return True

    def _check_index(self, i, j, kind):
        """Reference per-index bounds semantics (nuSIprop.hpp:359-405):
        out-of-range -> stderr warning + return-0 signal. The reference
        checks ``j > N_bins_E`` (an off-by-one; ``j == N_bins_E`` reads
        one past the allocation, undefined behavior) — here the full
        valid range is [0, N_bins_E) and anything else returns 0, with
        the warning worded like the reference's for the cases it
        detects."""
        import sys

        N = self.config.N_bins_E
        if i < 0 or i >= 3:
            sys.stderr.write(
                f"You asked for the flux of the {kind} {i}, not in "
                f"[0,1,2]. Zero will be returned.\n")
            return False
        if j < 0:
            sys.stderr.write(
                f"You asked for the flux at the energy bin {j}<0! "
                f"Zero will be returned.\n")
            return False
        if j >= N:
            sys.stderr.write(
                f"You asked for the flux at the energy bin {j}, but "
                f"there are only {N} bins! Zero will be returned.\n")
            return False
        return True

    def get_flux(self, i=None, j=None):
        """Flux per mass eigenstate.

        ``get_flux()`` returns the full (3, N_bins_E) array;
        ``get_flux(i)`` the (N_bins_E,) spectrum of eigenstate ``i``;
        ``get_flux(i, j)`` the scalar flux of eigenstate ``i`` at energy
        bin ``j`` — per-index access with the reference's out-of-range
        semantics (stderr warning + 0, nuSIprop.hpp:359-381)."""
        return self._get_flux_impl(i, j, "flux", "mass eigenstate")

    def _get_flux_impl(self, i, j, field, kind):
        if i is None and j is None:
            if not self._require_evolved():
                return np.zeros((3, self.config.N_bins_E))
            return np.asarray(getattr(self._result, field))
        if i is not None and j is None:
            # single-index: whole spectrum of state i (bounds-checked
            # like the scalar path; bin index 0 stands in as in-range)
            if not self._check_index(int(i), 0, kind):
                return np.zeros(self.config.N_bins_E)
            if not self._require_evolved():
                return np.zeros(self.config.N_bins_E)
            return np.asarray(getattr(self._result, field)[int(i)])
        if i is None:
            raise TypeError(
                "pass (i, j) for a scalar, (i) for one state's spectrum, "
                "or no indices for the full array")
        if not self._check_index(int(i), int(j), kind):
            return 0.0
        if not self._require_evolved():
            return 0.0
        return float(getattr(self._result, field)[int(i), int(j)])

    def get_flux_fla(self, i=None, j=None):
        """Flux per flavor {e, mu, tau}.

        ``get_flux_fla()`` returns the full (3, N_bins_E) array;
        ``get_flux_fla(i)`` the (N_bins_E,) spectrum of flavor ``i``;
        ``get_flux_fla(i, j)`` the scalar flavor-``i`` flux at bin ``j``
        with the reference's out-of-range semantics
        (nuSIprop.hpp:383-405)."""
        return self._get_flux_impl(i, j, "flux_fla", "flavor eigenstate")

    def get_energies(self):
        """Energy bin centers [eV], shape (N_bins_E,)."""
        from nusiprop_tpu.models import grids

        return np.asarray(grids.build(self.config).E_nu)

    def get_energy(self, i):
        """Central energy of bin ``i`` [eV], with the reference's
        out-of-range stderr-warning + 0 semantics
        (nuSIprop.hpp:412-429)."""
        import sys

        N = self.config.N_bins_E
        if i < 0:
            sys.stderr.write(
                f"You asked for the energy at the bin {i}<0! "
                f"Zero will be returned.\n")
            return 0.0
        if i >= N:
            sys.stderr.write(
                f"You asked for the energy at the bin {i}, but there "
                f"are only {N} bins! Zero will be returned.\n")
            return 0.0
        return float(self.get_energies()[int(i)])

    def get_N_bins_E(self):
        return self.config.N_bins_E

    def check_energy_conservation(self):
        """Relative total-energy drift vs free streaming.

        Like the reference (nuSIprop.hpp:339-357) this evolves the flux
        as a side effect — exactly one evolve per call.
        """
        val, res = transport.check_energy_conservation(
            self.params, self.config, pp_tables=self._pp_tables,
            return_result=True,
        )
        self.evolved = True
        self._result = res
        return float(val)

    # -- interpolated flux access (nuSIprop.pyx:120-128) ----------------------

    def _interp_flux(self, row, energy):
        E = self.get_energies()
        fla = self.get_flux_fla()[row]
        si = float(self.params.si)
        flat = fla * E**si
        energy = np.asarray(energy)
        # Parity with the reference: its scipy interp1d raises outside
        # the bin-center range (nuSIprop.pyx:120-128 — no fill_value).
        if np.any(energy < E[0]) or np.any(energy > E[-1]):
            raise ValueError(
                f"energy outside the interpolation range "
                f"[{E[0]:.6g}, {E[-1]:.6g}] eV (the reference's "
                f"interp1d raises here too)")
        x = np.log10(energy)
        return np.interp(x, np.log10(E), flat) / energy ** si

    def interp_flux_el(self, energy):
        """nu_e flux at arbitrary energy [eV] (log-E linear interp)."""
        return self._interp_flux(0, energy)

    def interp_flux_mu(self, energy):
        """nu_mu flux at arbitrary energy [eV]."""
        return self._interp_flux(1, energy)

    def interp_flux_ta(self, energy):
        """nu_tau flux at arbitrary energy [eV]."""
        return self._interp_flux(2, energy)


# Drop-in alias matching the reference class name (nuSIprop.pyx:12)
pyprop = Evolver
