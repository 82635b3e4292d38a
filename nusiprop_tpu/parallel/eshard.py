"""Storage-sharded source-energy (E') axis march of the non-resonant
evolve.

SURVEY.md §5: for >= ~1e4 energy bins the alpha regeneration
contraction (nuSIprop.hpp:289-291) becomes a large triangular matmul —
"shard the E' axis across devices with a psum (the closest analog to
sequence parallelism this workload has)". At that scale the extended
alpha TABLE ITSELF is the wall (NEXT^2 f64 ~ 800 MB at 1e4 bins), so
sharding only the compute (the round-4 prototype) cannot scale past
what one chip holds. This module shards BOTH:

* **Storage/build**: each device builds and holds ONLY its column
  block of the extended table —
  ``kernels_nr_f32.alpha_table_f32(cols_block=(d*C, C))`` evaluates
  just the (row, col) pairs the device owns (bitwise-identical to the
  corresponding columns of the full build; gated by
  tests/test_sharding.py). No device ever materializes the (NEXT,
  NEXT) table: per-device memory is ~1/D of replicated.
* **Compute**: the per-z-node implicit solve runs as a D-stage block
  back-substitution over EXTENDED-index blocks, and the regeneration
  feed is one per-device matvec + ``psum`` — the contraction SURVEY
  names.

The sliding-window alignment problem (the grid-coupling window moves
one bin per z-node, nuSIprop.hpp:268-272, so window-block ownership
would change per step) is resolved by keeping the solve in EXTENDED
coordinates: blocks are fixed [b*C, (b+1)*C) slices of the extended
axis, so block b's owner is ALWAYS device b; the per-node window
row/column scales (pu, qv, cs) are scattered into extended-padded
vectors at the window offset, and rows/columns outside the live window
carry zero scales — they solve to exactly zero and the block sweep
passes through them as no-ops.

Exactness: same f64 march arithmetic as ``march='trisolve'`` consuming
the same (f32-quadrature-built, f64-cast) tables, up to sum
association — gated at 1e-12 against the unsharded march by
tests/test_sharding.py, including a >=4096-bin storage-scaling demo.

Scope (prototype): the Majorana non-resonant channel family — the
SURVEY scenario. Dirac (staged f64 st channel) and phi-phi (spline
tables) additions are not block-built yet and raise.
"""

import dataclasses
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import (grids, kernels_nr_f32, masses, mixing,
                                 sources, transport)


def local_table_bytes(cfg: Config, D: int) -> tuple[int, int]:
    """(per-device block bytes, replicated full-table bytes) for the
    f64-cast alpha table at this config — the storage-scaling claim the
    >=4096-bin test measures."""
    NEXT = grids.build(cfg).Emin_ext.shape[0]
    C = -(-NEXT // D)
    NP = D * C
    return NP * C * 8, NEXT * NEXT * 8


def _build_block(params: PhysicsParams, cfg: Config, D: int, C: int):
    """Runs INSIDE shard_map: build ONLY this device's extended-column
    block of the alpha table, rows zero-padded to NP = D*C."""
    gr = grids.build(cfg)
    NEXT = gr.Emin_ext.shape[0]
    d = lax.axis_index("ecol")
    Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    A_loc = kernels_nr_f32.alpha_table_f32(
        gr.Emin_ext, gr.Emax_ext, mn, params.g, params.mphi, Wf,
        majorana=cfg.majorana, cols_block=(d * C, C))   # (NEXT, C) f64
    return jnp.pad(A_loc, ((0, D * C - NEXT), (0, 0)))


@lru_cache(maxsize=None)
def _build_jit(cfg: Config, mesh, D: int, C: int):
    def build(params):
        fn = jax.shard_map(
            partial(_build_block, cfg=cfg, D=D, C=C),
            mesh=mesh, in_specs=(P(),), out_specs=P(None, "ecol"),
            check_vma=False)
        return fn(params)

    return jax.jit(build)


def build_alpha_sharded(params: PhysicsParams, cfg: Config, mesh,
                        D: int, C: int):
    """The extended alpha table as a COLUMN-SHARDED global (NP, NP)
    array: each device builds and holds only its (NP, C) block (a
    sharded jax.Array — no device ever materializes the full table).
    Exposed so tests can feed the byte-identical table to the unsharded
    referee (the f32 build's rounding depends on the compiled program,
    so bitwise comparisons must share the built array, not rebuild)."""
    return _build_jit(cfg, mesh, D, C)(params)


def _march_esharded(params: PhysicsParams, tblG, tblAt, A_loc, lum_all,
                    cfg: Config, D: int, C: int):
    """Runs INSIDE shard_map (axis 'ecol'): the extended-block
    back-substitution march over this device's (NP, C) table block.

    ``lum_all`` (the per-node source integrals) is precomputed by the
    caller: the DSNB source's polylogarithm differences are
    cancellation-prone, so their rounding is compilation-context
    dependent at up to ~1e-7 relative — evaluating them once outside
    and threading the ARRAY in keeps the sharded march bitwise
    consistent with any referee fed the same array (and skips
    re-evaluating the polylog chains inside the scan)."""
    gr = grids.build(cfg)
    NE = cfg.N_bins_E
    Nz = gr.N_steps_z
    NP = D * C
    d = lax.axis_index("ecol")

    Wsq = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))
    Wf = Wsq[cfg.flav]

    dE = gr.Emax - gr.Emin
    inv_dE = 1.0 / dE
    z = gr.z
    Wf2 = Wf * Wf
    eyeC = jnp.eye(C, dtype=jnp.float64)

    def z_step(flux, xs_i):
        i, lum = xs_i
        zim = z[i - 1]
        ndfac = sources.get_nd(zim) / (1.0 + zim) ** 2
        pref = (1.0 + zim) * gr.dlogz / sources.get_H(zim)
        G_i = lax.dynamic_slice(tblG, (i - 1,), (NE,)) * ndfac
        At_i = lax.dynamic_slice(tblAt, (i - 1,), (NE,)) * ndfac
        Zdr = 1.0 + pref * (
            G_i[None, :] * Wf[:, None] - At_i[None, :] * Wf2[:, None]
        ) * inv_dE[None, :]
        coup = At_i * inv_dE
        U, V = transport._node_affine(pref, Zdr, coup, lum, flux, Wf)
        pu = U @ Wf
        qv = V @ Wf

        # scatter window scales into extended-padded coordinates: the
        # window [i-1, i-1+NE) is live, everything else is inert zero
        z0 = jnp.zeros(NP, dtype=jnp.float64)
        pu_e = lax.dynamic_update_slice(z0, pu, (i - 1,))
        qv_e = lax.dynamic_update_slice(z0, qv, (i - 1,))
        ivd_e = lax.dynamic_update_slice(z0, inv_dE, (i - 1,))
        ivd_loc = lax.dynamic_slice(ivd_e, (d * C,), (C,))
        # rounding association matches z_step_trisolve exactly:
        # (A * ndfac) * inv_dE — entrywise-bitwise-equal K, so the
        # 1e-12 exactness gate measures only sum re-association
        K_loc = (A_loc * ndfac) * ivd_loc[None, :]   # (NP, C)

        # D-stage extended-block back-substitution, highest block first;
        # block b's columns belong to device b by construction (static
        # ownership — the window slides, the blocks do not)
        def stage(s, y):
            b = D - 1 - s
            r0 = b * C
            Kb = lax.dynamic_slice(K_loc, (r0, 0), (C, C))
            y_loc = lax.dynamic_slice(y, (d * C,), (C,))
            r_sum = lax.psum(Kb @ y_loc, "ecol")
            pu_b = lax.dynamic_slice(pu_e, (r0,), (C,))
            r = lax.dynamic_slice(qv_e, (r0,), (C,)) + pu_b * r_sum
            M_bb = pu_b[:, None] * Kb
            y_b = jax.scipy.linalg.solve_triangular(
                eyeC - M_bb, r, lower=False, unit_diagonal=True)
            y_b = jnp.where(d == b, y_b, jnp.zeros_like(y_b))
            y_b = lax.psum(y_b, "ecol")
            return lax.dynamic_update_slice(y, y_b, (r0,))

        y = lax.fori_loop(0, D, stage, z0)

        # regeneration feed: the E'-axis psum contraction (SURVEY §5)
        y_loc = lax.dynamic_slice(y, (d * C,), (C,))
        reg_e = lax.psum(K_loc @ y_loc, "ecol")
        reg = lax.dynamic_slice(reg_e, (i - 1,), (NE,))
        x = V + reg[:, None] * U
        return x.T, None

    flux0 = jnp.zeros((3, NE), dtype=jnp.float64)
    steps = jnp.arange(Nz - 1, 0, -1)
    flux, _ = lax.scan(z_step, flux0, (steps, lum_all))
    flux = flux * inv_dE[None, :]
    return flux, Wsq @ flux


@lru_cache(maxsize=None)
def _esharded_jit(cfg: Config, mesh, D: int, C: int):
    repl = P()

    def run(params, tblG, tblAt, A_sharded, lum_all):
        fn = jax.shard_map(
            partial(_march_esharded, cfg=cfg, D=D, C=C),
            mesh=mesh,
            in_specs=(repl, repl, repl, P(None, "ecol"), repl),
            out_specs=(repl, repl),
            check_vma=False,
        )
        return fn(params, tblG, tblAt, A_sharded, lum_all)

    return jax.jit(run)


def evolve_esharded(params: PhysicsParams, cfg: Config, mesh=None,
                    pp_tables=None):
    """Non-resonant f64 evolve with the alpha table's STORAGE and the
    per-node solve/contraction sharded over the mesh's E' axis. Returns
    (flux, flux_fla).

    Each device builds only its extended-column block of the alpha
    table (no device materializes the full (NEXT, NEXT) array); the
    Gamma/alphaTilde tables (O(N)) ride replicated. See the module
    docstring for the extended-block solve design.
    """
    if not cfg.non_resonant:
        raise ValueError("E'-axis sharding targets the non-resonant "
                         "(dense-alpha) march")
    if pp_tables is not None:
        # cfg.phiphi without loaded tables is inert (the reference only
        # loads the splines when non_resonant && phiphi,
        # nuSIprop.hpp:166-170)
        raise ValueError("phi-phi channel is not block-built yet; the "
                         "storage-sharded E' march covers the "
                         "non-resonant closed-form channel family")
    if not cfg.majorana:
        raise ValueError("Dirac alphaTilde needs the staged f64 st "
                         "channel, which is not block-built yet")
    if (cfg.lEmax - cfg.lEmin) / cfg.N_bins_E > 0.05:
        raise ValueError(
            "the f32 quadrature block build needs production-resolution "
            "bins (<= 0.05 decades/bin; GL error ~ bin width^6) — use "
            "more bins or the unsharded f64 march")
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs).reshape(len(devs)), ("ecol",))
    D = int(mesh.devices.size)
    gr = grids.build(cfg)
    NEXT = gr.Emin_ext.shape[0]
    C = -(-NEXT // D)

    # Gamma/alphaTilde: same f32-ladder build the trisolve_f32 path
    # uses (O(N), replicated); built once outside shard_map
    cfg_b = dataclasses.replace(cfg, march="trisolve")
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]
    tblG, tblAt = kernels_nr_f32.nr_gamma_alphatilde_f32(
        gr.Emin_ext, gr.Emax_ext, mn, params.g, params.mphi, Wf,
        majorana=cfg.majorana)

    # source integrals evaluated ONCE, eagerly: the DSNB polylog
    # differences are cancellation-prone and compilation-context
    # sensitive (~1e-7 relative across program boundaries) — see
    # _march_esharded docstring
    norm_total = params.norm / sources.flux_fs_e0(params.si, gr.zmax_eff)
    steps = jnp.arange(grids.n_steps_z(cfg) - 1, 0, -1)
    lum_all = jax.vmap(
        lambda zz: sources.lum(cfg.source, zz, gr.Emin, gr.Emax,
                               params.si, norm_total))(gr.z[steps])

    repl = NamedSharding(mesh, P())
    tblG, tblAt, lum_all = (jax.device_put(t, repl)
                            for t in (tblG, tblAt, lum_all))
    params = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl),
                          params)
    A_sharded = build_alpha_sharded(params, cfg_b, mesh, D, C)
    return _esharded_jit(cfg_b, mesh, D, C)(params, tblG, tblAt, A_sharded,
                                            lum_all)
