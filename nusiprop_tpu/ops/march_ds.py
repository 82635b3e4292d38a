"""The rank1 (s-channel) march as ONE fused kernel in double-single f32.

Motivation (docs/DESIGN.md): the XLA rank1 march measures ~400x above a
VPU-bound estimate on TPU — the cost is f64-emulation + per-step
dispatch, not arithmetic. Mosaic (Pallas TPU) has no f64 at all, so the
fused kernel computes in double-single f32 pairs (ops/ds.py, ~49-bit
mantissa, f32 exponent range — the same envelope as XLA's emulation).

Structure:
  * `prepare_rank1_inputs` does ALL f64 work with the existing engine
    code (kernel tables, windows, sources) and emits per-z-node rows,
    pre-flipped into processing (descending-bin) order and padded to a
    lane multiple, as (hi, lo) f32 pairs.
  * `_march_body` is the kernel body: a fori_loop over z-nodes whose
    per-node work is pure elementwise ds algebra + a log-depth doubling
    scan for the regeneration recurrence. It is written against value
    semantics only (no refs), so the SAME function runs as plain JAX
    (CPU validation, `march_ds`) and inside `pl.pallas_call`
    (`march_pallas`, grid over the parameter batch).

Physics identical to transport.z_step_rank1 (nuSIprop.hpp:257-315 with
the alpha_cum fast path); agreement with the f64 engine is limited by
the 49-bit mantissa and the f32 exponent floor (bins below ~1e-38 in
counts flush — they are >40 decades under the peak).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nusiprop_tpu.config import Config, PhysicsParams
from nusiprop_tpu.models import grids, kernels, masses, mixing, sources
from nusiprop_tpu.models.transport import _source_lum
from nusiprop_tpu.ops import ds


# ---------------------------------------------------------------------------
# input preparation (f64, host/XLA side)
# ---------------------------------------------------------------------------

def prepare_rank1_inputs(params: PhysicsParams, cfg: Config, lane: int = 128):
    """Precompute per-z-node rows for the fused march, as ds pairs.

    Returns (inputs dict, meta dict). All rows are bin-FLIPPED into
    processing order (descending energy) and zero-padded to a multiple
    of ``lane`` (padded bins: zdr = 1, no source, no regeneration
    weight — they stay exactly zero through the march).
    """
    if cfg.non_resonant:
        raise ValueError("fused ds march implements the s-channel-only "
                         "configuration (rank1)")
    gr = grids.build(cfg)
    NE = cfg.N_bins_E
    Nz = gr.N_steps_z

    Wf = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))[cfg.flav]
    mn = masses.mass_spectrum(params.mntot, cfg.normal_ordering)
    norm_total = params.norm / sources.flux_fs_e0(params.si, gr.zmax_eff)

    kw = dict(majorana=cfg.majorana, non_resonant=False, phiphi=False)
    tblG = kernels.gamma_table(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                               params.mphi, Wf, **kw)
    tblAt = kernels.alphatilde_table(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                                     params.mphi, Wf, **kw)
    rho = kernels.alpha_s_rho(gr.Emin_ext, gr.Emax_ext, mn, params.g,
                              params.mphi, Wf, majorana=cfg.majorana)
    dE_ext = gr.Emax_ext - gr.Emin_ext
    inv_dE = 1.0 / (gr.Emax - gr.Emin)

    steps = jnp.arange(Nz - 1, 0, -1)
    zim = gr.z[steps - 1]
    zi = gr.z[steps]
    ndfac = sources.get_nd(zim) / (1.0 + zim) ** 2
    pref = (1.0 + zim) * gr.dlogz / sources.get_H(zim)

    idx = (steps - 1)[:, None] + jnp.arange(NE)[None, :]
    G_w = tblG[idx] * ndfac[:, None]
    At_w = tblAt[idx] * ndfac[:, None]
    rho_w = rho[idx] * ndfac[:, None]
    d_w = dE_ext[idx]
    lum = jax.vmap(lambda zz: _source_lum(cfg, zz, gr.Emin, gr.Emax,
                                          params.si, norm_total))(zi)

    # RANGE SAFETY: CW sits near the f32 exponent floor (~1e-37) — scale
    # it up and DW down by an exact power of two (each use pairs them).
    # DW also absorbs the bare implicit prefactor (the U solve is done
    # without it, so no scalar-indexed input is needed in the kernel).
    # Groupings matter on TPU: d_w*pref ~ 1e39 overflows BEFORE /RS and
    # rho*inv_dE ~ 1e-45 underflows BEFORE *RS — parenthesize the scale
    # onto the small factor first.
    RS = 2.0 ** 100
    rows = dict(
        PG=pref[:, None] * G_w * inv_dE[None, :],   # Zdr Gamma part
        PAt=pref[:, None] * At_w * inv_dE[None, :],  # Zdr alphaTilde part
        PL=pref[:, None] * lum,                      # source counts
        CO=At_w * inv_dE[None, :],                   # 3x3 coupling
        CW=rho_w * (inv_dE[None, :] * RS),           # cum accumulation wt
        DW=d_w * (pref[:, None] / RS),               # bin width x pref
    )
    NEP = lane * math.ceil(NE / lane)
    out = {}
    for name, arr in rows.items():
        arr = jnp.flip(arr, axis=1)                  # processing order
        arr = jnp.pad(arr, ((0, 0), (0, NEP - NE)))
        out[name + "_h"], out[name + "_l"] = ds.ds(arr)
    # PMNS weights are static per Config: bake them into the kernel
    Wf64 = np.asarray(Wf, dtype=np.float64)
    w_hi = Wf64.astype(np.float32)
    w_lo = (Wf64 - w_hi.astype(np.float64)).astype(np.float32)
    meta = dict(NE=NE, NEP=NEP, n_steps=int(Nz - 1),
                W=tuple((float(h), float(l)) for h, l in zip(w_hi, w_lo)))
    return out, meta


# ---------------------------------------------------------------------------
# ds helpers used by the body (tuple-of-(hi, lo) convention)
# ---------------------------------------------------------------------------

def _shift_concat(x, d, fill):
    """Shift x right by d along the last axis, filling with `fill`
    (static concat + slice: the plain-JAX implementation)."""
    pad = jnp.full(x.shape[:-1] + (d,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _shift_mosaic(x, d, fill):
    """Kernel-side shift: pltpu.roll + 2-D iota mask (Mosaic cannot
    lower lane-dim concatenation of 1-D vectors)."""
    from jax.experimental.pallas import tpu as pltpu

    x2 = x[None, :]
    rolled = pltpu.roll(x2, jnp.int32(d), 1)
    mask = lax.broadcasted_iota(jnp.int32, x2.shape, 1) < d
    return jnp.where(mask, jnp.asarray(fill, x.dtype), rolled)[0]


def _prefix_affine(a, b, shift):
    """Inclusive prefix composition of affine maps s -> a*s + b along the
    last axis, in log depth (Hillis-Steele doubling). a, b are ds pairs."""
    _shift1 = shift
    (ah, al), (bh, bl) = a, b
    n = ah.shape[-1]
    d = 1
    while d < n:
        pah, pal = _shift1(ah, d, 1.0), _shift1(al, d, 0.0)
        pbh, pbl = _shift1(bh, d, 0.0), _shift1(bl, d, 0.0)
        # compose: (a, b) <- (a * pa, a * pb + b)
        nah, nal = ds.mul(ah, al, pah, pal)
        tbh, tbl = ds.mul(ah, al, pbh, pbl)
        bh, bl = ds.add(tbh, tbl, bh, bl)
        ah, al = nah, nal
        d *= 2
    return (ah, al), (bh, bl)


def _dot_w(x, w):
    """sum_k x_k * w_k: 3-component ds vectors dotted with ds scalars."""
    acc = _mul_s(x[0], w[0])
    acc = _add(acc, _mul_s(x[1], w[1]))
    acc = _add(acc, _mul_s(x[2], w[2]))
    return acc


def _bc(s, like):
    """Broadcast a scalar ds pair against a vector ds pair."""
    return (jnp.broadcast_to(s[0], like[0].shape),
            jnp.broadcast_to(s[1], like[1].shape))


def _add(x, y):
    return ds.add(x[0], x[1], y[0], y[1])


def _sub(x, y):
    return ds.sub(x[0], x[1], y[0], y[1])


def _mul(x, y):
    return ds.mul(x[0], x[1], y[0], y[1])


def _mul_s(x, s):
    """Vector ds times scalar ds."""
    return ds.mul(x[0], x[1], *_bc(s, x))


def _recip(x):
    return ds.recip(x[0], x[1])


def _one_like(x):
    return (jnp.ones_like(x[0]), jnp.zeros_like(x[1]))


# ---------------------------------------------------------------------------
# the march body (value semantics; runs in plain JAX and inside Pallas)
# ---------------------------------------------------------------------------

def _march_body(row, n_steps: int, W_static, NEP: int, dtype,
                shift=_shift_concat, unroll=False):
    """Run the full z-march for ONE parameter point.

    ``row(name, t) -> (hi, lo)`` loads a per-z-node input row — a value
    dynamic-slice in plain JAX, a ref load inside the Pallas kernel
    (Mosaic has no dynamic_slice on values). W_static: baked-in (hi, lo)
    PMNS weights. Returns flux (3 ds pairs, processing order)."""
    W = [(jnp.asarray(h, dtype), jnp.asarray(l, dtype)) for h, l in W_static]
    W2 = [_mul(w, w) for w in W]

    zero = jnp.zeros((NEP,), dtype)
    flux0 = (zero, zero, zero, zero, zero, zero)  # 3 x (hi, lo)

    def step(t, carry):
        f0h, f0l, f1h, f1l, f2h, f2l = carry
        flux = [(f0h, f0l), (f1h, f1l), (f2h, f2l)]
        PG = row("PG", t)
        PAt = row("PAt", t)
        PL = row("PL", t)
        CO = row("CO", t)
        CW = row("CW", t)
        DW = row("DW", t)
        # Zdr_k = 1 + PG w_k - PAt w_k^2 ; izdr = 1/Zdr
        one = _one_like(PG)
        izdr = []
        for k in range(3):
            zk = _add(one, _sub(_mul_s(PG, W[k]), _mul_s(PAt, W2[k])))
            izdr.append(_recip(zk))

        # M = I + offd[m_k w_l], m_k = CO w_k / Zdr_k ; invert via adjugate
        m = [_mul(_mul_s(CO, W[k]), izdr[k]) for k in range(3)]
        M = [[_mul_s(m[k], W[l]) for l in range(3)] for k in range(3)]
        for k in range(3):
            M[k][k] = one
        A00 = _sub(_mul(M[1][1], M[2][2]), _mul(M[1][2], M[2][1]))
        A01 = _sub(_mul(M[0][2], M[2][1]), _mul(M[0][1], M[2][2]))
        A02 = _sub(_mul(M[0][1], M[1][2]), _mul(M[0][2], M[1][1]))
        A10 = _sub(_mul(M[1][2], M[2][0]), _mul(M[1][0], M[2][2]))
        A11 = _sub(_mul(M[0][0], M[2][2]), _mul(M[0][2], M[2][0]))
        A12 = _sub(_mul(M[0][2], M[1][0]), _mul(M[0][0], M[1][2]))
        A20 = _sub(_mul(M[1][0], M[2][1]), _mul(M[1][1], M[2][0]))
        A21 = _sub(_mul(M[0][1], M[2][0]), _mul(M[0][0], M[2][1]))
        A22 = _sub(_mul(M[0][0], M[1][1]), _mul(M[0][1], M[1][0]))
        det = _add(_add(_mul(M[0][0], A00), _mul(M[0][1], A10)),
                   _mul(M[0][2], A20))
        idet = _recip(det)
        adj = [[A00, A01, A02], [A10, A11, A12], [A20, A21, A22]]

        def solve3(b):
            out = []
            for k in range(3):
                acc = _mul(adj[k][0], b[0])
                acc = _add(acc, _mul(adj[k][1], b[1]))
                acc = _add(acc, _mul(adj[k][2], b[2]))
                out.append(_mul(acc, idet))
            return out

        # V = M^-1 (flux + PL)/Zdr ;  U = M^-1 w/Zdr (prefactor absorbed
        # into DW, which multiplies every use of U)
        rv = [_mul(_add(flux[k], PL), izdr[k]) for k in range(3)]
        ru = [_mul_s(izdr[k], W[k]) for k in range(3)]
        V = solve3(rv)
        U = solve3(ru)

        # scalar affine recurrence for the regeneration feed
        uw = _dot_w(U, W)
        vw = _dot_w(V, W)
        a = _add(_one_like(uw), _mul(_mul(CW, DW), uw))
        b = _mul(CW, vw)
        _, B_inc = _prefix_affine(a, b, shift)
        cum = (shift(B_inc[0], 1, 0.0), shift(B_inc[1], 1, 0.0))
        cd = _mul(cum, DW)

        new = []
        for k in range(3):
            xk = _add(V[k], _mul(cd, U[k]))
            new.extend(xk)
        return tuple(new)

    if unroll:
        # static unroll: Mosaic-friendly (static row indices, no i64
        # induction variable), and n_steps is a small static constant
        out = flux0
        for t in range(n_steps):
            out = step(t, out)
    else:
        out = lax.fori_loop(0, n_steps, step, flux0)
    return [(out[0], out[1]), (out[2], out[3]), (out[4], out[5])]


# ---------------------------------------------------------------------------
# plain-JAX entry (CPU validation + non-Pallas TPU path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def _march_ds_jit(inp, n_steps, W_static):
    def row(name, t):
        return (lax.dynamic_index_in_dim(inp[name + "_h"], t, 0, False),
                lax.dynamic_index_in_dim(inp[name + "_l"], t, 0, False))

    NEP = inp["PG_h"].shape[-1]
    return _march_body(row, n_steps, W_static, NEP, inp["PG_h"].dtype)


def march_ds(params: PhysicsParams, cfg: Config):
    """Full evolve via the ds march (no Pallas): returns flux_fla (3, NE)
    float64, for validation against transport.evolve."""
    inp, meta = prepare_rank1_inputs(params, cfg)
    pairs = _march_ds_jit(inp, meta["n_steps"], meta["W"])
    return _postprocess(pairs, cfg, meta)


def _postprocess(pairs, cfg, meta, batched=False):
    gr = grids.build(cfg)
    inv_dE = 1.0 / (gr.Emax - gr.Emin)
    flux = jnp.stack([ds.to_f64(h, l) for h, l in pairs],
                     axis=1 if batched else 0)
    flux = jnp.flip(flux[..., :meta["NE"]], axis=-1) * inv_dE
    Wsq = jnp.asarray(mixing.pmns_sq(cfg.normal_ordering))
    return jnp.einsum("ab,...bn->...an", Wsq, flux)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: whole march fused, grid over the parameter batch
# ---------------------------------------------------------------------------

_ROW_NAMES = ("PG", "PAt", "PL", "CO", "CW", "DW")


def _make_kernel(n_steps: int, W_static, NEP: int, interpret: bool):
    def kernel(*refs):
        # refs: 12 row refs (h/l x 6) + 6 out refs
        rref = {}
        i = 0
        for name in _ROW_NAMES:
            rref[name + "_h"] = refs[i]
            rref[name + "_l"] = refs[i + 1]
            i += 2
        outs = refs[i:]

        def row(name, t):
            # block shape (1, Ns, NEP): dynamic row load from the ref
            return (rref[name + "_h"][0, t], rref[name + "_l"][0, t])

        pairs = _march_body(row, n_steps, W_static, NEP,
                            rref["PG_h"].dtype,
                            shift=(_shift_concat if interpret
                                   else _shift_mosaic),
                            unroll=not interpret)
        flat = [pairs[0][0], pairs[0][1], pairs[1][0], pairs[1][1],
                pairs[2][0], pairs[2][1]]
        for o, v in zip(outs, flat):
            o[0, 0] = v

    return kernel


def march_pallas_batched(inp, meta, interpret: bool = False):
    """Run the fused march for a whole batch: every input row array has
    a leading batch axis; one grid instance per parameter point keeps
    the full march (all z-nodes) in VMEM with zero intermediate HBM
    traffic."""
    import jax.experimental.pallas as pl

    B = inp["PG_h"].shape[0]
    Ns = meta["n_steps"]
    NEP = meta["NEP"]
    f32 = inp["PG_h"].dtype

    in_specs = []
    args = []
    for name in _ROW_NAMES:
        for suf in ("_h", "_l"):
            args.append(inp[name + suf])
            in_specs.append(pl.BlockSpec((1, Ns, NEP), lambda b: (b, 0, 0)))
    # outputs carry a singleton axis so the (1, NEP) block equals the
    # trailing array dims (Mosaic tiling requirement)
    out_shape = [jax.ShapeDtypeStruct((B, 1, NEP), f32)] * 6
    out_specs = [pl.BlockSpec((1, 1, NEP), lambda b: (b, 0, 0))] * 6

    call = pl.pallas_call(
        _make_kernel(Ns, meta["W"], NEP, interpret),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    # the kernel is pure f32; trace it with x64 off so no i64 scalars
    # (loop indices, index_map results) leak into the Mosaic module
    with jax.enable_x64(False):
        outs = call(*args)
    outs = [o[:, 0, :] for o in outs]
    return [(outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5])]


def evolve_pallas(params: PhysicsParams, cfg: Config, interpret: bool = False):
    """Batched evolve through the fused Pallas march.

    params leaves must carry a leading batch axis. Returns flux_fla
    (B, 3, NE) float64.
    """
    inp = jax.vmap(lambda p: prepare_rank1_inputs(p, cfg)[0])(params)
    # meta is shape-only: derive it from any single point
    _, meta = prepare_rank1_inputs(jax.tree.map(lambda x: x[0], params), cfg)
    pairs = march_pallas_batched(inp, meta, interpret=interpret)
    return _postprocess(pairs, cfg, meta, batched=True)
