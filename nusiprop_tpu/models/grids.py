"""Energy and redshift grids.

The defining trick of the reference engine (nuSIprop.hpp:113-128): energy
bins are log-uniform, and the redshift grid spacing is locked to the bin
ratio, ``1 + z[i] = (Emax[0]/Emin[0])^i``. Redshifting between adjacent z
nodes then shifts the comoving spectrum by exactly one energy bin, so all
interaction-kernel integrals can be precomputed ONCE on an "extended" bin
axis (physical bins plus virtual top bins at higher redshift,
nuSIprop.hpp:218-233) instead of per z-step.

All grid construction is static (Python floats) because grid sizes fix
array shapes under jit; the returned arrays are float64 device constants.
"""

import math
from typing import NamedTuple

import jax.numpy as jnp

from nusiprop_tpu.config import Config


class Grids(NamedTuple):
    Emin: jnp.ndarray   # (NE,)   lower bin edges [eV]
    E_nu: jnp.ndarray   # (NE,)   log-central energies [eV]
    Emax: jnp.ndarray   # (NE,)   upper bin edges [eV]
    z: jnp.ndarray      # (Nz,)   redshift nodes, ascending from 0
    Emin_ext: jnp.ndarray  # (NE+Nz-2,) extended lower edges
    Emax_ext: jnp.ndarray  # (NE+Nz-2,) extended upper edges
    dlogz: float        # log(1+z[1]) - log(1+z[0]) == log(bin ratio)
    zmax_eff: float     # z[-1]; slightly above cfg.zmax (grid coupling)

    @property
    def N_bins_E(self) -> int:
        return self.Emin.shape[0]

    @property
    def N_steps_z(self) -> int:
        return self.z.shape[0]


def n_steps_z(cfg: Config) -> int:
    """Number of redshift nodes (nuSIprop.hpp:124, including the int cast)."""
    ratio = 10.0 ** ((cfg.lEmax - cfg.lEmin) / cfg.N_bins_E)
    return int(math.log(1.0 + cfg.zmax) / math.log(ratio) + 2.0)


def build(cfg: Config) -> Grids:
    NE = cfg.N_bins_E
    span = cfg.lEmax - cfg.lEmin
    i = jnp.arange(NE, dtype=jnp.float64)
    Emin = 10.0 ** (cfg.lEmin + span * i / NE)
    E_nu = 10.0 ** (cfg.lEmin + span * (i + 0.5) / NE)
    Emax = 10.0 ** (cfg.lEmin + span * (i + 1.0) / NE)

    Nz = n_steps_z(cfg)
    ratio = 10.0 ** (span / NE)
    k = jnp.arange(Nz, dtype=jnp.float64)
    z = ratio**k - 1.0
    zmax_eff = float(math.pow(ratio, Nz - 1) - 1.0)

    # Extended bins: index e < NE are the physical bins; e >= NE are the
    # top bin redshifted by (1 + z[e - NE + 1]) (nuSIprop.hpp:224-233).
    e = jnp.arange(NE + Nz - 2, dtype=jnp.float64)
    shift = jnp.where(e < NE, 0.0, e - (NE - 1))
    scale = ratio**shift
    idx = jnp.minimum(e, NE - 1).astype(jnp.int32)
    Emin_ext = Emin[idx] * scale
    Emax_ext = Emax[idx] * scale

    return Grids(
        Emin=Emin,
        E_nu=E_nu,
        Emax=Emax,
        z=z,
        Emin_ext=Emin_ext,
        Emax_ext=Emax_ext,
        dlogz=float(math.log(ratio)),
        zmax_eff=zmax_eff,
    )
