"""The non-resonant (trisolve) march as ONE fused Pallas TPU kernel.

Why (round-5 flagship perf item): the XLA trisolve_f32 march dispatches
~40 ops per z-step — window dynamic-slice, Neumann block-solve matmul
chain, Sherman-Morrison rows, regeneration matvec — and re-materializes
the (batch, NE, NE) kernel window from HBM every step. At the bench
shapes (batch 128, NE 500) that is ~1.4 ms/step of dispatch latency,
Neumann-chain MXU flops and HBM slicing against a ~0.1 ms/step HBM
floor for the useful traffic.

The fused kernel exploits the two structural facts the XLA path cannot:

* Each parameter point's ENTIRE extended alpha table (NEXT^2 f32 ~
  1.3 MB at NE=500) fits in VMEM. A chunk of ``_BC`` batch elements is
  DMA'd from HBM ONCE per march and every z-step's window is then a
  zero-cost row-offset into VMEM — total HBM traffic for the whole
  march drops from ~40 GB to ~0.2 GB at batch 128.
* The strictly-upper-triangular solve per z-step
  ``(I - diag(pu) A diag(CS)) y = qv`` (the descending-energy
  back-substitution of nuSIprop.hpp:266-305) is latency-bound no
  matter how it is blocked; inside one kernel a plain scalar
  back-substitution over bins — one (_BC, NXP) row FMA +
  lane-reduction per bin, batch elements riding the sublanes — costs
  no dispatch at all, and the feed vector ``p`` it produces IS the
  regeneration matvec the update needs (no second pass over the
  table).

Mosaic constraints shaping the code: dynamic lane indexing must be
128-aligned, so all per-bin scalar reads/writes are iota-mask selects
on full-width vectors, the solve state (cy, p) rides as fori_loop
carries rather than scratch, and the window->extended alignment is a
`pltpu.roll` by the (dynamic) window offset.

Numerics: identical algebra to transport._trisolve_f32_scan (same
free-streaming preconditioned rows from transport._trisolve_f32_rows,
same Sherman-Morrison per-node reduction) — only the association order
of the triangular solve differs (sequential substitution vs blocked
Neumann products), an f32-round-off-level difference far inside the
1e-3 physics gate (pinned by tests + tools/tpu_crosscheck --nr
--pallas). ``march_tri_jax`` is the same-order plain-JAX twin used as
the CPU referee and in the CPU test suite.

Reference: the per-(z, E)-node implicit update and descending-bin
sweep this fuses is nuSIprop.hpp:257-315.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import grids, masses, mixing, sources, transport

_BC = 8  # batch elements per kernel instance (one f32 sublane tile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sm_node(PG, PAt, CO, R0, S0, PT, phi, W):
    """Per-z-node Sherman-Morrison reduction shared by the Pallas kernel
    and the plain-JAX twin — the exact algebra of
    transport._trisolve_f32_scan.step (rank-one update of a diagonal;
    nuSIprop.hpp:281-305). Returns (U[3], V[3], qv, pu)."""
    W2 = [w * w for w in W]
    d = [1.0 + PG * W[k] - (PAt + CO) * W2[k] for k in range(3)]
    w_d = [W[k] / d[k] for k in range(3)]
    wu = w_d[0] * W[0] + w_d[1] * W[1] + w_d[2] * W[2]
    inv_s = 1.0 / (1.0 + CO * wu)
    rv = [phi[k] * R0 + S0 for k in range(3)]
    rv_d = [rv[k] / d[k] for k in range(3)]
    wv = W[0] * rv_d[0] + W[1] * rv_d[1] + W[2] * rv_d[2]
    cws = (CO * wv) * inv_s
    V = [rv_d[k] - cws * w_d[k] for k in range(3)]
    U = [w_d[k] * inv_s for k in range(3)]
    return U, V, wv * inv_s, PT * (wu * inv_s)


def _make_kernel(NE: int, NXP: int, Nz: int, W_static):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bc = _BC
    f32 = jnp.float32

    def kernel(A_hbm, pg, pat, co, r0, s0, cs, pt, out, A_s, phi_s, sem):
        c = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            # the chunk's tables, ONCE per march (layout (row, b, col):
            # the row reads below are dense (Bc, NXP) tiles)
            dma = pltpu.make_async_copy(
                A_hbm.at[:, pl.ds(c * Bc, Bc), :], A_s, sem)
            dma.start()
            dma.wait()
            phi_s[...] = jnp.zeros_like(phi_s)

        W = [f32(w) for w in W_static]
        PG, PAt, CO = pg[0], pat[0], co[0]
        R0, S0, PT = r0[0], s0[0], pt[0]
        phi = [phi_s[k] for k in range(3)]
        U, V, qv, pu = _sm_node(PG, PAt, CO, R0, S0, PT, phi, W)
        # cy update constants: cy_j = CS_j (qv_j + pu_j p_j) = c1 + c2 p,
        # rolled from window coords into extended coords (dynamic shift)
        CS = cs[0]
        offset = Nz - 2 - t  # window start (nuSIprop.hpp:268-272)
        c1e = pltpu.roll(CS * qv, offset, 1)
        c2e = pltpu.roll(CS * pu, offset, 1)
        ext_iota = lax.broadcasted_iota(jnp.int32, (Bc, NXP), 1)

        def one_bin(jj, carry):
            cy, pvec = carry
            j = NE - 1 - jj
            row = A_s[offset + j]                           # (Bc, NXP)
            p = jnp.sum(row * cy, axis=1, keepdims=True)    # (Bc, 1)
            # ONE iota compare serves both updates: pvec lives in
            # extended coords too and is un-rolled once after the loop
            mask = ext_iota == offset + j
            cy = jnp.where(mask, c1e + c2e * p, cy)
            pvec = jnp.where(mask, p, pvec)
            return cy, pvec

        # manual 4-way unroll (Mosaic fori_loop supports only
        # unroll=1/full): amortizes per-iteration loop overhead
        _U = 4

        def body(t, carry):
            base = t * _U
            for k in range(_U):
                carry = one_bin(base + k, carry)
            return carry

        zeros = jnp.zeros((Bc, NXP), f32)
        carry = lax.fori_loop(0, NE // _U, body, (zeros, zeros))
        for jj in range(NE - NE % _U, NE):
            carry = one_bin(jj, carry)
        _, pvec = carry
        # un-roll pvec from extended back to window coords (modular
        # left-shift by offset; all wrapped lanes are zeros)
        reg = PT * pltpu.roll(pvec, NXP - offset, 1)
        for k in range(3):
            x = V[k] + reg * U[k]
            phi_s[k] = x
            out[:, k, :] = x

    return kernel


def _pallas_march(A_t, xs, W_static, NE: int, Nz: int):
    """Run the fused march. A_t: (NEXT, Bpad, NXP) f32 (row, batch, col);
    xs: 7 arrays (Ns, Bpad, NXP) f32 in _trisolve_f32_rows order
    (PG, PAt, CO, R0, S0, CS, PT), window rows zero-padded to NXP lanes.
    Returns phi (Bpad, 3, NXP) f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEXT, B, NXP = A_t.shape
    Ns = Nz - 1
    grid = (B // _BC, Ns)

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + [
        pl.BlockSpec((1, _BC, NXP), lambda c, t: (t, c, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(7)
    ]
    out_spec = pl.BlockSpec((_BC, 3, NXP), lambda c, t: (c, 0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _make_kernel(NE, NXP, Nz, W_static),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, NXP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NEXT, _BC, NXP), jnp.float32),  # A chunk
            pltpu.VMEM((3, _BC, NXP), jnp.float32),     # phi carry
            pltpu.SemaphoreType.DMA,
        ],
    )
    with jax.enable_x64(False):
        return call(A_t, *xs)


def march_tri_jax(A32, xs, W_static, NE: int, Nz: int):
    """Plain-JAX twin of the fused march — the SAME substitution order
    (sequential descending-bin back-substitution, cy_j = c1 + c2 p
    grouping), for the CPU referee and the CPU test suite. A32:
    (B, NEXT, NEXT) f32 normalized table; xs: 7 arrays (B, Ns, NE) f32.
    Returns phi (B, 3, NE) f32."""
    NEXT = A32.shape[-1]
    W = [jnp.float32(w) for w in W_static]
    offs = jnp.asarray(Nz - 2 - jnp.arange(Nz - 1), dtype=jnp.int32)

    def one(A, rows):
        def step(phi, row_t):
            PG, PAt, CO, R0, S0, CS, PT, off = row_t
            U, V, qv, pu = _sm_node(PG, PAt, CO, R0, S0, PT, phi, W)
            c1 = CS * qv
            c2 = CS * pu

            def bin_body(cy, j):
                row = lax.dynamic_slice(
                    A, (off + j, jnp.int32(0)), (1, NEXT))[0]
                p = jnp.sum(row * cy)
                cyj = lax.dynamic_slice(c1, (j,), (1,)) + \
                    lax.dynamic_slice(c2, (j,), (1,)) * p
                cy = lax.dynamic_update_slice(cy, cyj, (off + j,))
                return cy, p

            cy0 = jnp.zeros((NEXT,), jnp.float32)
            _, ps = lax.scan(bin_body, cy0,
                             jnp.arange(NE - 1, -1, -1, dtype=jnp.int32))
            reg = PT * jnp.flip(ps)
            x = jnp.stack([V[k] + reg * U[k] for k in range(3)])
            return x, None

        phi0 = jnp.zeros((3, NE), jnp.float32)
        phi, _ = lax.scan(step, phi0, tuple(rows) + (offs,))
        return phi

    return jax.vmap(one)(A32, xs)


@lru_cache(maxsize=None)
def _evolve_fused_jit(cfg: Config, use_pallas: bool, with_pp: bool):
    gr = grids.build(cfg)
    NE = cfg.N_bins_E
    Nz = gr.N_steps_z
    NEXT = gr.Emin_ext.shape[0]
    NXP = _round_up(NEXT, 128)
    Wsq = mixing.pmns_sq(cfg.normal_ordering)
    Wf = jnp.asarray(Wsq)[cfg.flav]
    W_static = tuple(float(w) for w in jnp.asarray(Wf))
    inv_dE = 1.0 / (gr.Emax - gr.Emin)

    def run_from_tables(params: PhysicsParams, tables):
        tblG, tblAt, (A32, prefA) = tables
        B = params.mphi.shape[0]

        def rows_one(p, G, At, pf):
            norm_total = p.norm / sources.flux_fs_e0(p.si, gr.zmax_eff)
            ret, scale = transport._trisolve_f32_rows(
                cfg, gr, p, norm_total, G, At, pf)
            return tuple(ret[:7]), scale

        xs, scale = jax.vmap(rows_one)(params, tblG, tblAt, prefA)

        if use_pallas:
            Bpad = _round_up(B, _BC)
            pad_b = Bpad - B
            # zero-padded elements march as exact no-ops (d = s = 1,
            # all-zero rows/tables) and are sliced off
            xs_p = tuple(
                jnp.pad(x, ((0, pad_b), (0, 0), (0, NXP - NE)))
                .transpose(1, 0, 2) for x in xs)
            A_t = jnp.pad(A32, ((0, pad_b), (0, 0), (0, NXP - NEXT))
                          ).transpose(1, 0, 2)
            phi = _pallas_march(A_t, xs_p, W_static, NE, Nz)
            phi = phi[:B, :, :NE]
        else:
            phi = march_tri_jax(A32, xs, W_static, NE, Nz)

        flux = (phi.astype(jnp.float64) * scale[:, None, :]
                * inv_dE[None, None, :])
        flux_fla = jnp.einsum("ab,nbe->nae", jnp.asarray(Wsq), flux)
        mn = jax.vmap(
            lambda m: masses.mass_spectrum(m, cfg.normal_ordering)
        )(params.mntot)
        health = jax.vmap(
            lambda G, At, A: transport._table_health(
                [G, At, A], transport._march_tau(gr, G))
        )(tblG, tblAt, A32)
        bc = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
        return transport.EvolveResult(
            flux=flux, flux_fla=flux_fla, E_nu=bc(gr.E_nu),
            Emin=bc(gr.Emin), Emax=bc(gr.Emax), z=bc(gr.z), mn=mn,
            health=health)

    def run(params: PhysicsParams, pp_tables=None):
        tables = transport.build_tables(params, cfg, pp_tables=pp_tables,
                                        batched=True)
        return run_from_tables(params, tables)

    if with_pp == "tables":
        # bench stage-split entry: tables precomputed and traced in
        return jax.jit(run_from_tables)
    if with_pp:
        return jax.jit(run)
    return jax.jit(lambda p: run(p))


def evolve_trisolve_fused(params: PhysicsParams, cfg: Config,
                          pp_tables=None, use_pallas=None):
    """Batched evolve through the fused trisolve march.

    params leaves must carry a leading batch axis. On TPU the march is
    the single fused Pallas kernel; elsewhere the same-order plain-JAX
    twin. Table build and coefficient rows are shared verbatim with the
    trisolve_f32 path (transport.build_tables /
    transport._trisolve_f32_rows)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = _evolve_fused_jit(cfg, bool(use_pallas), pp_tables is not None)
    if pp_tables is not None:
        return fn(params, pp_tables)
    return fn(params)


def march_fused_with_tables(params: PhysicsParams, tables, cfg: Config,
                            use_pallas=None):
    """Fused evolve with the kernel tables precomputed (the
    transport.build_tables batched trisolve contract) — the march-only
    stage for bench stage splits."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return _evolve_fused_jit(cfg, bool(use_pallas), "tables")(params, tables)
