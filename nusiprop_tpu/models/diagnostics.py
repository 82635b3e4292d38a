"""Kernel-table diagnostics.

The reference guards every closed-form channel with a negativity check
that prints the offending parameters to stderr and substitutes a 3-point
Gauss-Legendre quadrature (nuSIprop.hpp:909-918, 1215-1231, 1505-1516).
The JAX kernels apply the same quadrature rescue branchlessly via
jnp.where; this module is the *observability* half: an offline audit that
reports where the closed forms went negative and how healthy the final
tables are, without slowing the hot path.

Usage:
    report = audit_kernels(params, cfg)
    print(report.pretty())
"""

import dataclasses

import jax.numpy as jnp

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import grids, kernels, masses, mixing


@dataclasses.dataclass
class KernelAudit:
    """Health report of the three kernel tables for one parameter point."""

    negative_gamma: int      # entries < 0 in the Gamma table (should be 0)
    negative_alphatilde: int
    negative_alpha: int
    nonfinite: int           # any non-finite entry across all tables
    gamma_range: tuple       # (min, max) of the Gamma table
    alphatilde_range: tuple
    alpha_range: tuple
    n_entries: int

    @property
    def healthy(self) -> bool:
        return (self.nonfinite == 0 and self.negative_gamma == 0
                and self.negative_alphatilde == 0 and self.negative_alpha == 0)

    def pretty(self) -> str:
        lines = [
            f"kernel audit over {self.n_entries} entries: "
            f"{'HEALTHY' if self.healthy else 'PROBLEMS FOUND'}",
            f"  Gamma:      {self.negative_gamma} negative, "
            f"range [{self.gamma_range[0]:.3e}, {self.gamma_range[1]:.3e}]",
            f"  alphaTilde: {self.negative_alphatilde} negative, "
            f"range [{self.alphatilde_range[0]:.3e}, {self.alphatilde_range[1]:.3e}]",
            f"  alpha:      {self.negative_alpha} negative, "
            f"range [{self.alpha_range[0]:.3e}, {self.alpha_range[1]:.3e}]",
            f"  non-finite entries: {self.nonfinite}",
        ]
        return "\n".join(lines)


def audit_kernels(params: PhysicsParams, cfg: Config,
                  pp_tables=None) -> KernelAudit:
    """Build the kernel tables for one parameter point and audit them.

    Negative final entries mean even the quadrature rescue produced a
    negative cross-section — the condition the reference screams about on
    stderr with a full parameter dump.
    """
    gr = grids.build(cfg)
    Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    kw = dict(majorana=cfg.majorana, non_resonant=cfg.non_resonant,
              phiphi=cfg.phiphi, pp_tables=pp_tables)

    tblG = kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                               params.mphi, Wf, **kw)
    tblAt = kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                                     params.mphi, Wf, **kw)
    tblA = kernels.alpha_table(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                               params.mphi, Wf, **kw)
    # only the strictly-upper triangle of alpha is physical
    mask = jnp.triu(jnp.ones_like(tblA, dtype=bool), k=1)
    alpha_phys = jnp.where(mask, tblA, 0.0)

    def _neg(x):
        return int(jnp.sum(x < 0))

    def _rng(x):
        return (float(jnp.min(x)), float(jnp.max(x)))

    nonfinite = int(
        jnp.sum(~jnp.isfinite(tblG)) + jnp.sum(~jnp.isfinite(tblAt))
        + jnp.sum(~jnp.isfinite(jnp.where(mask, tblA, 0.0)))
    )
    return KernelAudit(
        negative_gamma=_neg(tblG),
        negative_alphatilde=_neg(tblAt),
        negative_alpha=_neg(alpha_phys),
        nonfinite=nonfinite,
        gamma_range=_rng(tblG),
        alphatilde_range=_rng(tblAt),
        alpha_range=_rng(alpha_phys),
        n_entries=int(tblG.size + tblAt.size + tblA.size),
    )
