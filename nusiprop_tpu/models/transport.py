"""The transport engine: implicit redshift march of the binned flux.

Reference algorithm (nuSIprop.hpp:176-337, Details.pdf p.2): starting from
zero flux at z = zmax, march down in redshift; at each node solve, per
energy bin and mass eigenstate, the implicit-in-z linear system

    M x = Znr / Zdr,   x = flux at the new node

where absorption (Gamma) sits in the denominator Zdr, same-bin
regeneration (alphaTilde) couples the three eigenstates through a 3x3
matrix, and bin-to-bin regeneration (alpha) feeds lower bins from all
higher bins updated earlier in the same sweep (a block back-substitution
in descending energy).

TPU-native structure:
  * kernel tables are built ONCE on the extended bin axis (grids.py) as
    fused vectorized programs (kernels.py);
  * per z-node, the window of the extended tables relevant at that
    redshift is a `lax.dynamic_slice` — the grid-coupling trick makes the
    window contiguous;
  * the redshift march is a `lax.scan` over z-nodes, with an inner
    `lax.scan` over descending energy bins whose per-step work is a
    (3, NE) x (NE,) contraction against a strictly-triangular kernel row
    plus a closed-form 3x3 solve;
  * everything is a pure function of a PhysicsParams pytree, so parameter
    grids batch with vmap and shard with pjit (parallel/scan.py).
"""

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import grids, kernels, masses, mixing, sources


class EvolveResult(NamedTuple):
    flux: jnp.ndarray      # (3, NE) differential flux, mass basis
    flux_fla: jnp.ndarray  # (3, NE) differential flux, flavor basis (e, mu, tau)
    E_nu: jnp.ndarray      # (NE,) bin centers [eV]
    Emin: jnp.ndarray      # (NE,)
    Emax: jnp.ndarray      # (NE,)
    z: jnp.ndarray         # (Nz,)
    mn: jnp.ndarray        # (3,) mass eigenvalues [eV]


def _solve3(M, b):
    """Closed-form 3x3 linear solve via the adjugate (replaces the
    reference's GSL LU at nuSIprop.hpp:308-313; at 3x3 the explicit
    inverse is exact enough and batches perfectly)."""
    a, b_, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b_ * B + c * C
    adj = jnp.array(
        [
            [A, -(b_ * i - c * h), b_ * f - c * e],
            [B, a * i - c * g, -(a * f - c * d)],
            [C, -(a * h - b_ * g), a * e - b_ * d],
        ]
    )
    return adj @ b / det


def _source_lum(cfg: Config, z_src, Emin, Emax, si, norm_total):
    """Per-bin source integral at redshift z_src (vector over bins)."""
    if cfg.source == "dsnb":
        return sources.lum_dsnb(z_src, Emin, Emax)
    return sources.lum_powerlaw(z_src, Emin, Emax, si, norm_total)


def evolve_core(params: PhysicsParams, cfg: Config, pp_tables=None) -> EvolveResult:
    """Pure-function evolve; jit with cfg static (see `evolve`)."""
    gr = grids.build(cfg)
    NE = cfg.N_bins_E
    Nz = gr.N_steps_z

    Wsq = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))  # (3, 3)
    Wf = Wsq[cfg.flav]  # (3,)
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    norm_total = params.norm / sources.flux_fs_e0(params.si, gr.zmax_eff)

    kw = dict(
        majorana=cfg.majorana,
        non_resonant=cfg.non_resonant,
        phiphi=cfg.phiphi,
        pp_tables=pp_tables,
    )
    tblG = kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn, params.g, params.mphi, Wf, **kw)
    tblAt = kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext, mn, params.g, params.mphi, Wf, **kw)
    tblA = kernels.alpha_table(gr.Emin_ext, gr.Emax_ext, mn, params.g, params.mphi, Wf, **kw)

    dE = gr.Emax - gr.Emin
    inv_dE = 1.0 / dE
    dlogz = gr.dlogz
    z = gr.z
    Wf2 = Wf * Wf
    eye3 = jnp.eye(3, dtype=jnp.float64)
    offd_mask = 1.0 - eye3
    WfWf = jnp.outer(Wf, Wf)

    def z_step(flux, i):
        zim = z[i - 1]
        zi = z[i]
        H = sources.get_H(zim)
        ndfac = sources.get_nd(zim) / (1.0 + zim) ** 2
        pref = (1.0 + zim) * dlogz / H

        # Window of the extended tables active at this z-node: entry j-1
        # of the window equals extended entry j+i-2 (nuSIprop.hpp:268-272).
        G_i = lax.dynamic_slice(tblG, (i - 1,), (NE,)) * ndfac
        At_i = lax.dynamic_slice(tblAt, (i - 1,), (NE,)) * ndfac
        A_i = lax.dynamic_slice(tblA, (i - 1, i - 1), (NE, NE)) * ndfac

        lum = _source_lum(cfg, zi, gr.Emin, gr.Emax, params.si, norm_total)

        # Zdr[k, j] (nuSIprop.hpp:294)
        Zdr = 1.0 + pref * (
            G_i[None, :] * Wf[:, None] - At_i[None, :] * Wf2[:, None]
        ) * inv_dE[None, :]

        def j_step(flx, j):
            jm = j - 1
            arow = A_i[jm]  # strictly-triangular zeros mask m < j
            s_l = (flx * inv_dE[None, :]) @ arow  # (3,), sum over source bins
            reg = jnp.dot(Wf, s_l)
            src = pref * (lum[jm] + reg * Wf)  # (3,)
            zdr = Zdr[:, jm]
            rhs = (flx[:, jm] + src) / zdr
            coup = At_i[jm] * inv_dE[jm]
            M = eye3 + offd_mask * (coup * WfWf / zdr[:, None])
            x = _solve3(M, rhs)
            return flx.at[:, jm].set(x), None

        flux, _ = lax.scan(j_step, flux, jnp.arange(NE, 0, -1))
        return flux, None

    flux0 = jnp.zeros((3, NE), dtype=jnp.float64)
    flux, _ = lax.scan(z_step, flux0, jnp.arange(Nz - 1, 0, -1))

    flux = flux * inv_dE[None, :]          # counts -> differential flux
    flux_fla = Wsq @ flux                  # mass -> flavor basis

    return EvolveResult(
        flux=flux,
        flux_fla=flux_fla,
        E_nu=gr.E_nu,
        Emin=gr.Emin,
        Emax=gr.Emax,
        z=z,
        mn=mn,
    )


@lru_cache(maxsize=None)
def _jitted_evolve(cfg: Config):
    return jax.jit(lambda p: evolve_core(p, cfg))


def evolve(params: PhysicsParams, cfg: Config, pp_tables=None) -> EvolveResult:
    """Evolve the flux; compiled once per Config, cached across params."""
    if pp_tables is not None:
        # tables are arrays (pytree) — jit them as traced args
        return jax.jit(
            lambda p, t: evolve_core(p, cfg, pp_tables=t)
        )(params, pp_tables)
    return _jitted_evolve(cfg)(params)


def check_energy_conservation(params: PhysicsParams, cfg: Config,
                              pp_tables=None):
    """(E_int - E_FS)/E_FS (nuSIprop.hpp:339-357).

    Faithful to the reference fork: the free-streaming energy E_FS uses
    the *power-law* source forms regardless of the active source model.
    """
    gr = grids.build(cfg)
    norm_total = params.norm / sources.flux_fs_e0(params.si, gr.zmax_eff)
    E_FS = sources.energy_fs(cfg.lEmin, cfg.lEmax, params.si, norm_total,
                             gr.zmax_eff)
    res = evolve(params, cfg, pp_tables=pp_tables)
    logw = jnp.log(res.Emax) - jnp.log(res.Emin)
    E_int = jnp.sum(logw[None, :] * res.E_nu[None, :] ** 2 * res.flux)
    return (E_int - E_FS) / E_FS
