"""Source-energy (E') axis sharding of the non-resonant march.

SURVEY.md §5: for >= ~1e4 energy bins the alpha regeneration
contraction (nuSIprop.hpp:289-291) becomes a large triangular matmul —
"shard the E' axis across devices with a psum (the closest analog to
sequence parallelism this workload has)". This module is that design,
implemented with ``shard_map`` over one mesh axis:

* the per-z-node window matrix K[j, m] = alpha[j, m]/dE_m is split in
  SOURCE-bin (column) blocks across the mesh;
* the per-node implicit system (I - diag(pu) K) y = qv (the
  transport.z_step_trisolve closure) is solved as a D-stage block
  back-substitution in descending energy: at stage b every device
  contracts ITS columns of the already-solved higher-energy blocks
  (one (S, S_local) matmul), a ``psum`` over the E' axis assembles the
  stage's right-hand side, the device owning block b solves the S x S
  diagonal system, and a second ``psum`` broadcasts the solved block —
  energy flows downward exactly like the reference's descending-bin
  sweep, device by device instead of bin by bin;
* the final regeneration feed reg = K @ (y) reduces over the source
  axis with one more ``psum`` — the contraction SURVEY names.

Exactness: same f64 arithmetic as march="trisolve" up to sum
association (the block-partitioned contraction and the blocked
back-substitution re-associate sums) — gated at 1e-12 against the
unsharded march by tests/test_sharding.py.

Prototype scope (documented): the extended kernel table itself rides
REPLICATED — what is sharded is the per-node O(NE^2) compute (the
contraction and the solve), not table storage; a storage-sharded
variant additionally needs the shifting window-to-device alignment
resolved (the grid-coupling window slides one bin per z-node,
nuSIprop.hpp:268-272).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import grids, masses, mixing, sources, transport


def _block_trisolve(M_local, qv, d, D, S):
    """y = (I - M)^{-1} qv with M strictly upper, column-sharded.

    M_local: (NE, S) — this device's column block of M (global columns
    [d*S, (d+1)*S)). Runs D sequential stages, highest block first.
    Every device executes identical ops (SPMD); ``where`` masks select
    the owning device's contribution, psum broadcasts.
    """
    NE = D * S
    y = jnp.zeros(NE, dtype=qv.dtype)
    eye = jnp.eye(S, dtype=qv.dtype)
    for b in range(D - 1, -1, -1):
        # stage rhs: qv_b + sum over all higher-energy solved entries;
        # each device contracts its own columns (y entries outside its
        # block, or not yet solved, are zero) -> psum assembles the row
        r_partial = (M_local[b * S:(b + 1) * S, :]
                     @ lax.dynamic_slice(y, (d * S,), (S,)))
        r = qv[b * S:(b + 1) * S] + lax.psum(r_partial, "ecol")
        # the device owning block b holds the diagonal block in its
        # local columns; everyone solves (identical op shape), the mask
        # keeps only the owner's result and psum broadcasts it
        M_bb = lax.dynamic_slice(M_local, (b * S, 0), (S, S))
        y_b = jax.scipy.linalg.solve_triangular(
            eye - M_bb, r, lower=False, unit_diagonal=True)
        y_b = jnp.where(d == b, y_b, jnp.zeros_like(y_b))
        y_b = lax.psum(y_b, "ecol")
        y = lax.dynamic_update_slice(y, y_b, (b * S,))
    return y


def _march_esharded(params: PhysicsParams, tables, cfg: Config, D: int):
    """march='trisolve' with the per-node solve + contraction sharded
    over the E' (source-bin) axis; runs INSIDE shard_map (axis 'ecol')."""
    gr = grids.build(cfg)
    NE = cfg.N_bins_E
    Nz = gr.N_steps_z
    assert NE % D == 0, (NE, D)
    S = NE // D
    d = lax.axis_index("ecol")

    Wsq = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))
    Wf = Wsq[cfg.flav]
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    norm_total = params.norm / sources.flux_fs_e0(params.si, gr.zmax_eff)
    tblG, tblAt, tblA = tables

    dE = gr.Emax - gr.Emin
    inv_dE = 1.0 / dE
    z = gr.z
    Wf2 = Wf * Wf

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

        # THIS device's column block of the windowed kernel matrix
        K_local = lax.dynamic_slice(
            tblA, (i - 1, i - 1 + d * S), (NE, S)) * ndfac
        K_local = K_local * lax.dynamic_slice(inv_dE, (d * S,), (S,))[None, :]
        M_local = pu[:, None] * K_local

        y = _block_trisolve(M_local, qv, d, D, S)
        # regeneration feed: the E'-axis psum contraction (SURVEY §5)
        reg = lax.psum(
            K_local @ lax.dynamic_slice(y, (d * S,), (S,)), "ecol")
        x = V + reg[:, None] * U
        return x.T, None

    flux0 = jnp.zeros((3, NE), dtype=jnp.float64)
    steps = jnp.arange(Nz - 1, 0, -1)
    lum_all = jax.vmap(
        lambda zz: sources.lum(cfg.source, zz, gr.Emin, gr.Emax,
                               params.si, norm_total))(z[steps])
    flux, _ = lax.scan(z_step, flux0, (steps, lum_all))
    flux = flux * inv_dE[None, :]
    return flux, Wsq @ flux


@lru_cache(maxsize=None)
def _esharded_jit(cfg: Config, mesh, D: int):
    from jax.experimental.shard_map import shard_map

    repl = P()

    def run(params, tables):
        fn = shard_map(
            partial(_march_esharded, cfg=cfg, D=D),
            mesh=mesh,
            in_specs=(repl, repl),
            out_specs=(repl, repl),
            check_rep=False,
        )
        return fn(params, tables)

    return jax.jit(run)


def evolve_esharded(params: PhysicsParams, cfg: Config, mesh=None,
                    pp_tables=None):
    """Non-resonant f64 evolve with the per-node alpha solve/contraction
    sharded over the mesh's E' axis. Returns (flux, flux_fla).

    Requires a non-resonant config whose march resolves to 'trisolve'
    semantics; N_bins_E must divide by the mesh size.
    """
    if not cfg.non_resonant:
        raise ValueError("E'-axis sharding targets the non-resonant "
                         "(dense-alpha) march")
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs).reshape(len(devs)), ("ecol",))
    D = int(mesh.devices.size)
    if cfg.N_bins_E % D != 0:
        raise ValueError(f"N_bins_E={cfg.N_bins_E} must divide the "
                         f"{D}-device E' mesh")
    import dataclasses

    cfg64 = dataclasses.replace(cfg, march="trisolve", table_dtype="f64")
    tables = transport.build_tables(params, cfg64, pp_tables=pp_tables)
    repl = NamedSharding(mesh, P())
    tables = jax.tree.map(lambda x: jax.device_put(x, repl), tables)
    params = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), repl),
                          params)
    return _esharded_jit(cfg64, mesh, D)(params, tables)
